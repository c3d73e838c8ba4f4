"""Paired A/B: bm25_retrieve_batch's doc-length attach — groupBy(dl)+join
(current) vs window sum over the tf table. Alternating order."""
import os, statistics, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F

from unstract_spark.session import get_spark
from unstract_spark import queries as Q

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab13d")
spark.range(1_000_000).selectExpr("sum(id)").collect()

K1, B = Q._BM25_K1, Q._BM25_B
qdf = spark.createDataFrame(
    [(qid, list(ts)) for qid, ts in Q._BM25_BATCH],
    "query_id int, terms array<string>",
)

def build(window_dl: bool):
    docs = Q._t(spark, sf_dir, "documents")
    q_terms = qdf.select(
        "query_id", F.explode("terms").alias("word")
    ).select("query_id", F.lower(F.col("word")).alias("word")).distinct()
    words = docs.select(
        F.col("doc_id"),
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    scalars = (
        docs.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(tf.agg(F.sum("tf").alias("total_words")))
    )
    vocab = q_terms.select("word").distinct()
    if window_dl:
        wd = Window.partitionBy("doc_id")
        tf2 = tf.withColumn("dl", F.sum("tf").over(wd))
        qtf = tf2.join(F.broadcast(vocab), "word")
        joined = q_terms.join(qtf, "word")
    else:
        qtf = tf.join(F.broadcast(vocab), "word")
        dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        joined = q_terms.join(qtf, "word").join(dl, "doc_id")
    df_t = qtf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_words") / F.col("n_docs")
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + K1 * (1 - B + B * F.col("dl") / avgdl)
    per_term = idf * (F.col("tf") * (K1 + 1)) / denom
    scored = (
        joined.join(F.broadcast(df_t), "word")
        .crossJoin(F.broadcast(scalars))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(per_term.cast("decimal(28,10)")), 6).cast("double").alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)

# result-equality check first
a = {tuple(r) for r in build(False).collect()}
b = {tuple(r) for r in build(True).collect()}
print("results equal:", a == b, len(a))

def run(window_dl):
    t0 = time.time(); build(window_dl).count(); return time.time() - t0

run(False); run(True)
cur, win = [], []
for i in range(4):
    if i % 2 == 0:
        cur.append(run(False)); win.append(run(True))
    else:
        win.append(run(True)); cur.append(run(False))
print(f"groupBy+join median {statistics.median(cur):.2f} {sorted(cur)}")
print(f"window-dl    median {statistics.median(win):.2f} {sorted(win)}")
