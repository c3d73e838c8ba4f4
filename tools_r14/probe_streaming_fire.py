"""Break a streaming KMV fire into phases: engine machinery vs sketch
vs snapshot write vs estimate job. Replicates streaming_kmv_pipeline
with per-phase timers, driven exactly like bench._streaming_kmv_bench.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: F401

from unstract_spark.session import get_spark
from unstract_spark.streaming import incremental as inc
from unstract_spark.operators import sketches

PHASES = {}


def timed(name, f):
    t0 = time.time()
    r = f()
    PHASES.setdefault(name, []).append(round(time.time() - t0, 3))
    return r


def kmv_pipeline_probe(spark, source_dir, checkpoint_dir, store_dir, out_dir,
                       col="text", k=256, schema="doc_id long, text string"):
    fires = 0
    run_base = inc._run_base(out_dir, store_dir, checkpoint_dir=checkpoint_dir)

    def process(batch, epoch):
        nonlocal fires
        if timed("isEmpty", batch.isEmpty):
            return
        fires += 1
        bid = run_base + int(epoch)
        inc._pin_bid(checkpoint_dir, bid)
        bsk = sketches.kmv_sketch(batch.select(col), col, k)
        old = timed("read_prior", lambda: inc._read_prior_snapshot(spark, store_dir, bid))
        merged = sketches.kmv_merge(bsk, old.select("h"), k=k) if old is not None else bsk
        timed("snapshot_write", lambda: merged.write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={bid}"))
        snap = spark.read.parquet(f"{store_dir}/batch_id={bid}")
        timed("estimate_job", lambda: sketches.kmv_estimate(snap, k).write.mode(
            "overwrite").parquet(f"{out_dir}/batch_id={bid}"))
        names = os.listdir(store_dir) if os.path.isdir(store_dir) else []
        prior = sorted(int(d.split("=", 1)[1]) for d in names
                       if d.startswith("batch_id=") and d.split("=", 1)[1].isdigit()
                       and int(d.split("=", 1)[1]) < bid)
        for p in prior[:-1]:
            shutil.rmtree(os.path.join(store_dir, f"batch_id={p}"), ignore_errors=True)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "100").parquet(source_dir))
    t0 = time.time()
    q = (stream.writeStream.foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    PHASES.setdefault("whole_fire", []).append(round(time.time() - t0, 3))
    return fires


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_fire")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base = tempfile.mkdtemp(prefix="probe_skmv_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text")
        src = os.path.join(base, "src")
        # untimed warm fire on 3 rows (mirrors bench._streaming_warm)
        warm = os.path.join(base, "warmsrc")
        docs.limit(3).write.mode("append").parquet(warm)
        kmv_pipeline_probe(spark, warm, os.path.join(base, "wck"),
                           os.path.join(base, "wst"), os.path.join(base, "wout"))
        PHASES.clear()
        n = 3
        for i in range(n):
            docs.filter(f"doc_id % {n} = {i}").write.mode("append").parquet(src)
            kmv_pipeline_probe(spark, src, os.path.join(base, "ckpt"),
                               os.path.join(base, "store"), os.path.join(base, "out"))
        for k_, v in PHASES.items():
            print(f"{k_:15s} {v} sum={sum(v):.2f}", flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()


def kmv_pipeline_fold(spark, source_dir, checkpoint_dir, store_dir, out_dir,
                      col="text", k=256, schema="doc_id long, text string"):
    """Variant A: one collect of the merged sketch feeds BOTH writes as
    local data — the estimate job's parquet re-read + aggregation
    disappears; writes carry no lineage."""
    fires = 0
    run_base = inc._run_base(out_dir, store_dir, checkpoint_dir=checkpoint_dir)

    def process(batch, epoch):
        nonlocal fires
        if batch.isEmpty():
            return
        fires += 1
        bid = run_base + int(epoch)
        inc._pin_bid(checkpoint_dir, bid)
        bsk = sketches.kmv_sketch(batch.select(col), col, k)
        old = inc._read_prior_snapshot(spark, store_dir, bid)
        merged = sketches.kmv_merge(bsk, old.select("h"), k=k) if old is not None else bsk
        hs = [r.h for r in merged.collect()]
        snap_df = spark.createDataFrame([(h,) for h in hs], "h long")
        snap_df.write.mode("overwrite").parquet(f"{store_dir}/batch_id={bid}")
        n = len(hs)
        kth = max(hs) if hs else None
        est = float(n) if n < k else float(k - 1) * sketches.KMV_M / float(kth)
        spark.createDataFrame([(k, n, kth, est)],
                              "k long, n_sketch long, kth_hash long, est_distinct double"
                              ).write.mode("overwrite").parquet(f"{out_dir}/batch_id={bid}")
        names = os.listdir(store_dir) if os.path.isdir(store_dir) else []
        prior = sorted(int(d.split("=", 1)[1]) for d in names
                       if d.startswith("batch_id=") and d.split("=", 1)[1].isdigit()
                       and int(d.split("=", 1)[1]) < bid)
        for p in prior[:-1]:
            shutil.rmtree(os.path.join(store_dir, f"batch_id={p}"), ignore_errors=True)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "100").parquet(source_dir))
    q = (stream.writeStream.foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return fires


def run3(spark, docs, base, tag, fn):
    src = os.path.join(base, f"src_{tag}")
    total = 0.0
    n = 3
    for i in range(n):
        docs.filter(f"doc_id % {n} = {i}").write.mode("append").parquet(src)
        t0 = time.time()
        fn(spark, src, os.path.join(base, f"ck_{tag}"), os.path.join(base, f"st_{tag}"),
           os.path.join(base, f"out_{tag}"))
        total += time.time() - t0
    return round(total, 2)


def main_ab():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_fire_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base = tempfile.mkdtemp(prefix="probe_skmv_ab_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text")
        warm = os.path.join(base, "warmsrc")
        docs.limit(3).write.mode("append").parquet(warm)
        kmv_pipeline_probe(spark, warm, os.path.join(base, "wck"),
                           os.path.join(base, "wst"), os.path.join(base, "wout"))
        res = {}
        for rnd in range(2):
            for tag, fn in (("cur", inc.streaming_kmv_pipeline), ("fold", kmv_pipeline_fold)):
                res.setdefault(tag, []).append(run3(spark, docs, base, f"{tag}{rnd}", fn))
        print("cur :", res["cur"], flush=True)
        print("fold:", res["fold"], flush=True)
        # identity gate: same snapshots and same estimates from both
        import glob as _g
        a = sorted(r.h for r in spark.read.parquet(
            os.path.join(base, "st_cur1") + "/batch_id=*").collect())
        b = sorted(r.h for r in spark.read.parquet(
            os.path.join(base, "st_fold1") + "/batch_id=*").collect())
        ea = spark.read.parquet(os.path.join(base, "out_cur1") + "/batch_id=*").collect()
        eb = spark.read.parquet(os.path.join(base, "out_fold1") + "/batch_id=*").collect()
        print("snapshots equal:", a == b, flush=True)
        print("estimates equal:", sorted(map(tuple, ea)) == sorted(map(tuple, eb)), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
