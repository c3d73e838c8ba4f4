"""ABAB: minhash near-dup with eager localCheckpoint of sigs (A) vs
plain lineage + AQE exchange reuse (B). Same session, alternating."""
import os, sys, time, statistics
sys.path.insert(0, "/root/repo")
from unstract_spark.session import get_spark
from unstract_spark import queries as Q
from unstract_spark.operators import dedup
from pyspark.sql import functions as F

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab_minhash")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def run_a():
    sh = dedup.char_shingles(Q._t(spark, sf_dir, "documents"))
    sigs = dedup.minhash_signatures(sh).localCheckpoint(eager=True)
    pairs = dedup.lsh_candidate_pairs(sigs)
    dedup.minhash_similarity(sigs, pairs).count()


def run_b():
    sh = dedup.char_shingles(Q._t(spark, sf_dir, "documents"))
    sigs = dedup.minhash_signatures(sh)
    pairs = dedup.lsh_candidate_pairs(sigs)
    dedup.minhash_similarity(sigs, pairs).count()


run_a(); run_b()  # warm both
ta, tb = [], []
for i in range(4):
    t0 = time.time(); run_a(); ta.append(time.time() - t0)
    t0 = time.time(); run_b(); tb.append(time.time() - t0)
print("A ckpt :", [round(x, 2) for x in ta], "median", round(statistics.median(ta), 2))
print("B plain:", [round(x, 2) for x in tb], "median", round(statistics.median(tb), 2))

# check reuse in B's executed plan
sh = dedup.char_shingles(Q._t(spark, sf_dir, "documents"))
sigs = dedup.minhash_signatures(sh)
pairs = dedup.lsh_candidate_pairs(sigs)
df = dedup.minhash_similarity(sigs, pairs)
df.count()
p = df._jdf.queryExecution().executedPlan().toString()
print("B ReusedExchange:", p.count("ReusedExchange"), "Exchanges:", p.count("Exchange"))
