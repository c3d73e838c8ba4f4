"""operators/export.py: deterministic sharding, mixture sampling,
sharded writes, small-file compaction."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from unstract_spark.operators import export


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )


def test_shard_assignment_is_reproducible_and_balanced(spark):
    d = _docs(spark)
    a = {(r.doc_id, r.shard, r.shard_pos) for r in export.deterministic_shards(d, 8).collect()}
    b = {(r.doc_id, r.shard, r.shard_pos) for r in export.deterministic_shards(d, 8).collect()}
    assert a == b  # byte-reproducible across runs
    by_shard = {}
    for _, s, _ in a:
        by_shard[s] = by_shard.get(s, 0) + 1
    assert set(by_shard) == set(range(8))
    assert max(by_shard.values()) < 3 * min(by_shard.values())  # roughly uniform


def test_shard_positions_are_dense_per_shard(spark):
    rows = export.deterministic_shards(_docs(spark, 64), 4).collect()
    per = {}
    for r in rows:
        per.setdefault(r.shard, []).append(r.shard_pos)
    for s, poss in per.items():
        assert sorted(poss) == list(range(len(poss)))


def test_salt_changes_the_shuffle_not_the_corpus(spark):
    d = _docs(spark, 64)
    a = {r.doc_id: r.shard for r in export.deterministic_shards(d, 4, salt="s1").collect()}
    b = {r.doc_id: r.shard for r in export.deterministic_shards(d, 4, salt="s2").collect()}
    assert set(a) == set(b)  # same rows
    assert a != b  # different assignment


def test_mixture_sample_rates_and_stability(spark):
    d = _docs(spark, 400)
    out = export.mixture_sample(
        d, {"src0": 1.0, "src1": 0.5, "src2": 0.0}, default_fraction=0.05
    )
    counts = {r.source: r.c for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts["src0"] == 100  # fraction 1.0 keeps everything
    assert "src2" not in counts  # fraction 0 drops everything
    assert 20 <= counts.get("src1", 0) <= 80  # ~50% of 100
    assert counts.get("src3", 0) <= 20  # default 5% of 100
    again = export.mixture_sample(
        d, {"src0": 1.0, "src1": 0.5, "src2": 0.0}, default_fraction=0.05
    )
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}


def test_write_training_shards_round_trip(spark, tmp_path):
    d = _docs(spark, 120)
    path = str(tmp_path / "shards")
    export.write_training_shards(d, path, n_shards=4)
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{path}/shard=*"))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.parquet(path)
    assert back.count() == 120
    # stored order per shard follows shard_pos (sequential reader
    # streams the shuffled order)
    one = spark.read.parquet(f"{path}/shard=0").collect()
    assert [r.shard_pos for r in one] == sorted(r.shard_pos for r in one)


def test_compact_small_files_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "landing")
    dst = str(tmp_path / "compacted")
    # simulate a streaming sink's droppings: 16 tiny files
    _docs(spark, 160).repartition(16).write.parquet(src)
    n_src = len(glob.glob(f"{src}/part-*"))
    assert n_src == 16
    n_out = export.compact_small_files(spark, src, dst, target_file_bytes=64 * 1024 * 1024)
    assert n_out == 1
    assert len(glob.glob(f"{dst}/part-*")) == 1
    assert spark.read.parquet(dst).count() == 160


def test_compact_respects_target_size(spark, tmp_path):
    src = str(tmp_path / "landing2")
    dst = str(tmp_path / "compacted2")
    _docs(spark, 500).repartition(10).write.parquet(src)
    total = sum(os.path.getsize(p) for p in glob.glob(f"{src}/part-*"))
    n_out = export.compact_small_files(spark, src, dst, target_file_bytes=total // 3 + 1)
    assert n_out == 3


def test_invalid_shard_count_raises(spark):
    with pytest.raises(ValueError):
        export.deterministic_shards(_docs(spark, 4), 0)
