"""Paired A/B: ANN shortlist windows carrying full vectors vs id+score proxy.

Current pq/sq8/ivfpq paths select (query_vec, index_vec) into the `paired`
frame, so the per-query arank window's Exchange carries two 64-double
arrays per candidate row. Variant B (slim) shuffles only
(query_id, index_id, adc), cuts the shortlist, then re-attaches the
vectors: query_vec via the tiny broadcast queries frame, index_vec via a
second column-pruned scan of the index joined on index_id (guide §2.3
"project before the exchange" / §8 "decide with small rows, move big
rows once"). Results must be IDENTICAL (same rows, same values): the
re-attach joins on unique keys and cosine runs on the same stored
vectors.

Asserts identity both ways (exceptAll), then ABAB x3 with the noop sink.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import Window, functions as F

from unstract_spark.session import get_spark
from unstract_spark.queries import _t
from unstract_spark.operators import similarity as S


def q_frame(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return q, e


# ---- current spellings (delegate to the module) -------------------------

def pq_cur(q, e):
    return S.pq_topk_join(q, e, dim=64, k=10).select(
        "query_id", "vec_id", "score", "rank"
    )


def sq8_cur(q, e):
    return S.sq8_topk_join(q, e, dim=64, k=10).select(
        "query_id", "vec_id", "score", "rank"
    )


def ivfpq_cur(q, e):
    return S.ivfpq_topk_join(q, e, dim=64, k=10).select(
        "query_id", "vec_id", "score", "rank"
    )


# ---- slim spellings ------------------------------------------------------

def _rerank(shortlist, queries, index, k):
    """Re-attach vectors to the id-only shortlist and exact-rerank."""
    withq = shortlist.join(
        F.broadcast(queries.select("query_id", "query_vec")), "query_id"
    )
    scored = (
        F.broadcast(withq)
        .join(index.select("vec_id", "embedding"), "vec_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                S.cosine(F.col("embedding"), F.col("query_vec")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def pq_slim(q, e, dim=64, k=10, n_sub=8, n_codes=16, refine=3):
    cbs = S.pq_codebooks(dim, n_sub, n_codes)
    d = dim // n_sub
    codes = S.pq_encode(e, dim, n_sub, n_codes, "vec_id", "embedding", cbs)
    qq = q.select(F.col("query_id"), *S._pq_lut_cols(cbs, "query_vec", d))
    adc = S._adc_expr(n_sub)
    paired = codes.crossJoin(F.broadcast(qq)).select(
        "query_id", "vec_id", adc.alias("adc")
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        paired.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= refine * k)
        .select("query_id", "vec_id")
    )
    return _rerank(shortlist, q, e, k)


def sq8_slim(q, e, dim=64, k=10, refine=3, bits=8):
    iscale, icodes = S._sq8_cols("embedding", "i", bits=bits)
    _qscale, qcodes = S._sq8_cols("query_vec", "q", bits=bits)
    codes = e.select(F.col("vec_id"), iscale, icodes)
    qq = q.select(F.col("query_id"), qcodes)
    adc_int = F.aggregate(
        F.zip_with(F.col("q_codes"), F.col("i_codes"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    paired = codes.crossJoin(F.broadcast(qq)).select(
        "query_id",
        "vec_id",
        (adc_int.cast("double") / F.col("i_scale")).alias("adc"),
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        paired.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= refine * k)
        .select("query_id", "vec_id")
    )
    return _rerank(shortlist, q, e, k)


def ivfpq_slim(q, e, dim=64, k=10, n_centroids=16, n_probe=3, n_sub=8,
               n_codes=16, refine=3):
    cents = S._seeded_hyperplanes(dim, n_centroids, table=991)
    cbs = S.pq_codebooks(dim, n_sub, n_codes)
    d = dim // n_sub
    ib = S._argmax_cells(e, "vec_id", "embedding", 1, cents, None)
    codes = S.pq_encode(ib, dim, n_sub, n_codes, "vec_id", "embedding", cbs,
                        keep=("cell",))
    qb = S._argmax_cells(q, "query_id", "query_vec", n_probe, cents, None)
    qq = qb.select(
        F.col("query_id"), F.col("cell"), *S._pq_lut_cols(cbs, "query_vec", d)
    )
    cands = codes.join(F.broadcast(qq), "cell").select(
        "query_id", "vec_id", S._adc_expr(n_sub).alias("adc")
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        cands.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= refine * k)
        .select("query_id", "vec_id")
    )
    return _rerank(shortlist, q, e, k)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_ann_slim")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    q, e = q_frame(spark, sf_dir)

    pairs = [
        ("pq", pq_cur, pq_slim),
        ("sq8", sq8_cur, sq8_slim),
        ("ivfpq", ivfpq_cur, ivfpq_slim),
    ]
    for name, cur, slim in pairs:
        a, b = cur(q, e), slim(q, e)
        d1 = a.exceptAll(b).count()
        d2 = b.exceptAll(a).count()
        print(f"{name}: identity exceptAll {d1}/{d2}", flush=True)
        assert d1 == 0 and d2 == 0, f"{name} results differ"

    for name, cur, slim in pairs:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        noop(cur(q, e)); noop(slim(q, e))  # warm both
        ta, tb = [], []
        for _ in range(3):
            t0 = time.time(); noop(cur(q, e)); ta.append(time.time() - t0)
            t0 = time.time(); noop(slim(q, e)); tb.append(time.time() - t0)
        print(
            f"{name}: cur {[round(x,2) for x in ta]} med {statistics.median(ta):.2f}"
            f" | slim {[round(x,2) for x in tb]} med {statistics.median(tb):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
