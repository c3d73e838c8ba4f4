"""Where does sim_pq/ivfpq time go? Time each pipeline stage with noop.

Stages probed: raw scan, pq_encode only, paired+window shortlist (no
rerank), full query. Also an encode variant computed in numpy via
mapInPandas (argmax per subspace; assignment gap ~4e-5 >> float64 sum
reassociation error, so codes are identical — asserted).
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


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(tag, fn, n=3):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.time(); fn(); ts.append(time.time() - t0)
    print(f"{tag}: {[round(x,2) for x in ts]} med {statistics.median(ts):.2f}",
          flush=True)


def pq_encode_np(e, dim=64, n_sub=8, n_codes=16):
    cbs = S.pq_codebooks(dim, n_sub, n_codes)
    d = dim // n_sub
    cb = np.stack(cbs)                     # (n_sub, n_codes, d)
    halves = 0.5 * (cb * cb).sum(axis=2)   # (n_sub, n_codes)

    def enc(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "embedding": [],
                                    **{f"code_{m}": [] for m in range(n_sub)}})
                continue
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out = {"vec_id": pdf["vec_id"], "embedding": pdf["embedding"]}
            for m in range(n_sub):
                sub = V[:, m * d:(m + 1) * d]            # (n, d)
                scores = sub @ cb[m].T - halves[m]       # (n, n_codes)
                out[f"code_{m}"] = scores.argmax(axis=1).astype(np.int32)
            yield pd.DataFrame(out)

    schema = ("vec_id long, embedding array<float>, "
              + ", ".join(f"code_{m} int" for m in range(n_sub)))
    return e.select("vec_id", "embedding").mapInPandas(enc, schema)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_pq")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    dim, n_sub, n_codes, k, refine = 64, 8, 16, 10, 3
    cbs = S.pq_codebooks(dim, n_sub, n_codes)
    d = dim // n_sub

    # code identity: JVM argmax vs numpy argmax
    jvm = S.pq_encode(e, dim, n_sub, n_codes, "vec_id", "embedding", cbs)
    npv = pq_encode_np(e, dim, n_sub, n_codes)
    cols = ["vec_id"] + [f"code_{m}" for m in range(n_sub)]
    d1 = jvm.select(cols).exceptAll(npv.select(cols)).count()
    d2 = npv.select(cols).exceptAll(jvm.select(cols)).count()
    print(f"encode identity: {d1}/{d2}", flush=True)

    timeit("scan", lambda: noop(e.select("vec_id", "embedding")))
    timeit("encode_jvm", lambda: noop(
        S.pq_encode(e, dim, n_sub, n_codes, "vec_id", "embedding", cbs)))
    timeit("encode_np", lambda: noop(pq_encode_np(e, dim, n_sub, n_codes)))

    def shortlist(codes_fn):
        codes = codes_fn()
        qq = q.select(F.col("query_id"), F.col("query_vec"),
                      *S._pq_lut_cols(cbs, "query_vec", d))
        adc = S._adc_expr(n_sub)
        paired = codes.crossJoin(F.broadcast(qq)).select(
            "query_id", "query_vec", "vec_id", "embedding", adc.alias("adc"))
        wa = Window.partitionBy("query_id").orderBy(
            F.col("adc").desc(), F.col("vec_id").asc())
        return (paired.withColumn("arank", F.row_number().over(wa))
                .filter(F.col("arank") <= refine * k))

    timeit("shortlist_jvm", lambda: noop(shortlist(
        lambda: S.pq_encode(e, dim, n_sub, n_codes, "vec_id", "embedding", cbs))))
    timeit("full_jvm", lambda: noop(
        S.pq_topk_join(q, e, dim=64, k=10)))

    # full query with numpy encode
    def full_np():
        codes = pq_encode_np(e, dim, n_sub, n_codes)
        qq = q.select(F.col("query_id"), F.col("query_vec"),
                      *S._pq_lut_cols(cbs, "query_vec", d))
        adc = S._adc_expr(n_sub)
        paired = codes.crossJoin(F.broadcast(qq)).select(
            "query_id", "query_vec", "vec_id", "embedding", adc.alias("adc"))
        wa = Window.partitionBy("query_id").orderBy(
            F.col("adc").desc(), F.col("vec_id").asc())
        shortl = (paired.withColumn("arank", F.row_number().over(wa))
                  .filter(F.col("arank") <= refine * k))
        scored = shortl.select(
            "query_id", "vec_id",
            F.round(S.cosine(F.col("embedding"), F.col("query_vec")), 6)
            .alias("score"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("vec_id").asc())
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))

    a = S.pq_topk_join(q, e, dim=64, k=10).select("query_id", "vec_id", "score", "rank")
    b = full_np().select("query_id", "vec_id", "score", "rank")
    print("full identity:", a.exceptAll(b).count(), b.exceptAll(a).count(), flush=True)
    timeit("full_np", lambda: noop(full_np()))


if __name__ == "__main__":
    main()
