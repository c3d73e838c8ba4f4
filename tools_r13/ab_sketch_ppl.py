"""Paired same-session A/B: (1) kmv sketch materialization via
localCheckpoint (old) vs bounded driver collect (new); (2)
ta_perplexity_buckets join-back (old) vs payload-through-rank (new).
ABAB interleaved, 4 rounds each, medians printed."""
import os, statistics, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from unstract_spark.session import get_spark
from unstract_spark import queries as Q
import unstract_spark.operators.sketches as sk
from unstract_spark.operators import text_analysis
from unstract_spark.operators.ranks import range_prefix

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab13")
spark.range(1_000_000).selectExpr("sum(id)").collect()

collect_mat = sk._materialize_sketch
def ckpt_mat(sketch):
    return sketch.localCheckpoint(eager=True)

def join_size():
    o = Q._t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("ok"),
        F.col("o_custkey").cast("string").alias("ck"),
    )
    li = Q._t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("ok")
    )
    r1 = sk.kmv_join_size(o, "ok", li, "ok", k=256)
    r2 = sk.kmv_join_size(o, "ck", o, "ck", k=256)
    r1.unionByName(r2).count()

def overlap():
    d = Q._t(spark, sf_dir, "documents")
    def words(m):
        return d.filter(F.col("doc_id") % 2 == m).select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        ).filter(F.col("w") != "")
    sk.kmv_overlap(words(0), "w", words(1), "w", k=256).count()

def ppl_old():
    d = Q._t(spark, sf_dir, "documents")
    scored = text_analysis.unigram_logprob(d).filter(F.col("n_words") > 0)
    ranked = range_prefix(
        scored.select("avg_logprob", "doc_id"),
        ["avg_logprob", "doc_id"], rank_col="rnk",
    ).select("doc_id", "rnk")
    nrow = scored.agg(F.count(F.lit(1)).alias("n"))
    bucket = (
        F.when(F.col("rnk") <= F.floor(F.col("n") / 3), F.lit("tail"))
        .when(F.col("rnk") <= F.floor(2 * F.col("n") / 3), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    scored.join(ranked, "doc_id").crossJoin(F.broadcast(nrow)).select(
        "doc_id", "n_words", "avg_logprob", bucket.alias("ppl_bucket")
    ).count()

def ppl_new():
    Q.queries()["ta_perplexity_buckets"](spark, sf_dir).count()

def ab(name, fa, fb, rounds=4):
    ta, tb = [], []
    fa(); fb()  # warm both
    for _ in range(rounds):
        t0 = time.time(); fa(); ta.append(time.time() - t0)
        t0 = time.time(); fb(); tb.append(time.time() - t0)
    print(f"{name}: A(old) median {statistics.median(ta):.2f} {sorted(ta)} "
          f"B(new) median {statistics.median(tb):.2f} {sorted(tb)}", flush=True)

sk._materialize_sketch = ckpt_mat
def js_old(): join_size()
def ov_old(): overlap()
def js_new():
    sk._materialize_sketch = collect_mat
    join_size()
    sk._materialize_sketch = ckpt_mat
def ov_new():
    sk._materialize_sketch = collect_mat
    overlap()
    sk._materialize_sketch = ckpt_mat

ab("sk_join_size", js_old, js_new)
ab("sk_kmv_overlap", ov_old, ov_new)
ab("ta_perplexity", ppl_old, ppl_new)
