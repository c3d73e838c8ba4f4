"""Gates for profile.chisq_drift and the streaming drift monitor."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from unstract_spark.operators import profile
from unstract_spark.streaming.incremental import streaming_drift_monitor


def _hist(spark, rows):
    return spark.createDataFrame(rows, "source string, bucket int, o long")


def test_chisq_identical_histograms_zero(spark):
    h = _hist(spark, [("a", 0, 10), ("a", 1, 20), ("b", 0, 5)])
    out = {r.source: r.chisq_micro for r in profile.chisq_drift(h, h).collect()}
    assert out == {"a": 0, "b": 0}


def test_chisq_scaled_histograms_zero(spark):
    # chi-square compares SHAPES: a 3x-scaled copy has zero drift
    s = _hist(spark, [("a", 0, 10), ("a", 1, 20)])
    b = _hist(spark, [("a", 0, 30), ("a", 1, 60)])
    out = profile.chisq_drift(s, b).collect()
    assert out[0].chisq_micro == 0


def test_chisq_matches_scipy_formula(spark):
    s = _hist(spark, [("a", 0, 30), ("a", 1, 10), ("a", 2, 5)])
    b = _hist(spark, [("a", 0, 100), ("a", 1, 80), ("a", 2, 40)])
    got = profile.chisq_drift(s, b).collect()[0].chisq_micro
    o = np.array([30.0, 10, 5])
    r = np.array([100.0, 80, 40])
    S, R = o.sum(), r.sum()
    expect = sum(
        (oi * R - ri * S) ** 2 / (S * R * (oi + ri)) for oi, ri in zip(o, r)
    )
    # per-bucket micro quantization: within a micro per bucket
    assert abs(got - round(expect * 1e6)) <= len(o)


def test_chisq_one_sided_group_null(spark):
    s = _hist(spark, [("a", 0, 10), ("new", 0, 3)])
    b = _hist(spark, [("a", 0, 10), ("gone", 1, 7)])
    out = {r.source: r.chisq_micro for r in profile.chisq_drift(s, b).collect()}
    assert out["a"] == 0
    assert out["new"] is None and out["gone"] is None


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_streaming_drift_monitor(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    # fire 1: short docs from both sources -> baseline
    f1 = [(i, "x" * 40, "s1") for i in range(30)] + [
        (100 + i, "y" * 45, "s2") for i in range(30)
    ]
    _docs(spark, f1).coalesce(1).write.mode("append").parquet(src)
    assert streaming_drift_monitor(spark, src, ck, state, out) == 1
    r1 = {r.source: r for r in spark.read.parquet(out).collect()}
    assert r1["s1"].chisq_micro is None  # no baseline on first fire
    assert r1["s1"].fire_docs == 30

    # fire 2: s1 stays short, s2 shifts to LONG docs -> s2 spikes
    f2 = [(200 + i, "x" * 41, "s1") for i in range(30)] + [
        (300 + i, "z" * 900, "s2") for i in range(30)
    ]
    _docs(spark, f2).coalesce(1).write.mode("append").parquet(src)
    assert streaming_drift_monitor(spark, src, ck, state, out) == 1
    fires = sorted(
        int(d.split("=")[1])
        for d in __import__("os").listdir(out)
        if d.startswith("batch_id=")
    )
    r2 = {
        r.source: r
        for r in spark.read.parquet(f"{out}/batch_id={fires[-1]}").collect()
    }
    assert r2["s1"].chisq_micro == 0  # same bucket -> no drift
    assert r2["s2"].chisq_micro > 10_000_000  # hard shift -> big statistic

    # batch equivalence: final state == whole-corpus histogram,
    # exactly one row per (source, bucket)
    state_rows = sorted(
        (r.source, r.bucket, r.o)
        for r in spark.read.parquet(
            f"{state}/batch_id={max(int(d.split('=')[1]) for d in __import__('os').listdir(state) if d.startswith('batch_id='))}"
        ).collect()
    )
    whole = sorted(
        (r.source, r.bucket, r.o)
        for r in _docs(spark, f1 + f2)
        .select(
            "source",
            F.least(F.expr("length(text) div 64"), F.lit(15)).alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .collect()
    )
    assert state_rows == whole
    assert len(state_rows) == len({(s, b) for s, b, _ in state_rows})
