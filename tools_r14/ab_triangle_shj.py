"""Paired A/B: SMJ (default) vs SHUFFLE_HASH-hinted joins in triangle_count.

Variant B hints SHUFFLE_HASH on the wedge self-join's right side and the
closing edge join's right side (per-join hints, not a global
preferSortMergeJoin flip). Asserts identical results, then ABAB x3 on
the full graph_triangle_counts pipeline at sf0.1.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from unstract_spark.session import get_spark
from unstract_spark.queries import _t


def pairs_edges(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("its"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(its, (x, i) -> "
                    "transform(slice(its, i + 2, size(its)), "
                    "y -> struct(x AS src, y AS dst))))"
                )
            ).alias("pr")
        )
        .select("pr.src", "pr.dst")
    )
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= 2)
        .select("src", "dst")
    )


def triangle(edges, mode: str):
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).localCheckpoint(
        eager=True
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    if mode == "bcast":
        du, dv = F.broadcast(du), F.broadcast(dv)
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dd"),
        )
    ).localCheckpoint(eager=True)
    o1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("dd").alias("db"))
    o2 = o.select(F.col("src").alias("a2"), F.col("dst").alias("c"), F.col("dd").alias("dc"))
    if mode == "shj":
        o2 = o2.hint("shuffle_hash")
    elif mode == "bcast":
        o2 = F.broadcast(o2)
    wedges = o1.join(o2, o1["a"] == o2["a2"]).filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    if mode == "shj":
        closing = closing.hint("shuffle_hash")
    elif mode == "bcast":
        closing = F.broadcast(closing)
    tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    nodes = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_triangle")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    ne = pairs_edges(spark, sf_dir).count()
    print("n_edges:", ne, flush=True)
    a = triangle(pairs_edges(spark, sf_dir), "smj")
    for m in ("shj", "bcast"):
        b = triangle(pairs_edges(spark, sf_dir), m)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"symdiff smj vs {m}:", diff, flush=True)
        assert diff == 0

    arms = {
        m: (lambda m=m: triangle(pairs_edges(spark, sf_dir), m).count())
        for m in ("smj", "shj", "bcast")
    }
    times = {k: [] for k in arms}
    for _ in range(4):
        for k, f in arms.items():
            spark.sparkContext.setJobDescription(f"ab:{k}")
            t0 = time.time()
            f()
            times[k].append(round(time.time() - t0, 3))
    for k, v in times.items():
        # first round is warm-up; median of the rest
        print(f"{k} median={statistics.median(v[1:]):.3f} runs={v}", flush=True)


if __name__ == "__main__":
    main()


def triangle_nockpt(edges, mode: str):
    """No localCheckpoint variant: every consumer of e/o re-derives the
    lineage, but the expensive exchanges (pairs groupBys) are shared via
    AQE ReusedExchange; the post-shuffle edge frames are tiny."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dd"),
        )
    )
    o1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("dd").alias("db"))
    o2 = o.select(F.col("src").alias("a2"), F.col("dst").alias("c"), F.col("dd").alias("dc"))
    if mode == "shj":
        o2 = o2.hint("shuffle_hash")
    wedges = o1.join(o2, o1["a"] == o2["a2"]).filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    if mode == "shj":
        closing = closing.hint("shuffle_hash")
    tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    nodes = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def main2():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_triangle2")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    a = triangle(pairs_edges(spark, sf_dir), "smj")
    for m in ("smj", "shj"):
        b = triangle_nockpt(pairs_edges(spark, sf_dir), m)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"symdiff ckpt-smj vs nockpt-{m}:", diff, flush=True)
        assert diff == 0
    import time as _t
    arms = {
        "ckpt_smj": lambda: triangle(pairs_edges(spark, sf_dir), "smj").count(),
        "nockpt_smj": lambda: triangle_nockpt(pairs_edges(spark, sf_dir), "smj").count(),
        "nockpt_shj": lambda: triangle_nockpt(pairs_edges(spark, sf_dir), "shj").count(),
        "pairs_only": lambda: pairs_edges(spark, sf_dir).count(),
    }
    times = {k: [] for k in arms}
    for _ in range(4):
        for k, f in arms.items():
            spark.sparkContext.setJobDescription(f"ab2:{k}")
            t0 = _t.time()
            f()
            times[k].append(round(_t.time() - t0, 3))
    for k, v in times.items():
        print(f"{k} median={statistics.median(v[1:]):.3f} runs={v}", flush=True)
