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


def _lens(spark, lengths):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(lengths)], "doc_id long, n_tokens long"
    )


def test_pack_sequences_fills_packs_in_order(spark):
    d = _lens(spark, [100] * 20)
    rows = export.pack_sequences(d, budget=400, len_col="n_tokens").collect()
    per_pack = {}
    for r in rows:
        per_pack.setdefault(r.pack_id, []).append(r)
    # uniform 100-token rows into a 400 budget -> packs of exactly 4
    assert all(len(v) == 4 for v in per_pack.values())
    # offsets are a contiguous layout: each pack spans [id*400, id*400+400)
    for pid, v in per_pack.items():
        offs = sorted(r.pack_off for r in v)
        assert offs == [pid * 400 + k * 100 for k in range(4)]


def test_pack_sequences_overshoot_bounded_by_one_row(spark):
    rng_lens = [37, 251, 83, 110, 9, 340, 77, 64, 205, 18, 96, 143]
    d = _lens(spark, rng_lens)
    rows = export.pack_sequences(d, budget=300, len_col="n_tokens").collect()
    per_pack = {}
    for r in rows:
        per_pack.setdefault(r.pack_id, 0)
        per_pack[r.pack_id] += r.n_tokens
    max_len = max(rng_lens)
    assert all(total < 300 + max_len for total in per_pack.values())


def test_pack_sequences_giant_row_does_not_drag_neighbors(spark):
    # a row longer than the budget spans several boundaries; the next
    # row must start a fresh pack, not share the giant's
    d = _lens(spark, [10, 5000, 10, 10])
    rows = {r.doc_id: r for r in export.pack_sequences(d, budget=100, len_col="n_tokens").collect()}
    by_off = sorted(rows.values(), key=lambda r: r.pack_off)
    giant = next(r for r in by_off if r.n_tokens == 5000)
    after = [r for r in by_off if r.pack_off > giant.pack_off]
    assert all(r.pack_id > giant.pack_id for r in after)


def test_pack_sequences_sharded_is_reproducible(spark):
    d = _docs(spark, 100).withColumn("n_tokens", (F.col("doc_id") % 7 + 1) * 10)
    a = {(r.doc_id, r.shard, r.pack_id, r.pack_off)
         for r in export.pack_sequences(d, 500, "n_tokens", n_shards=4).collect()}
    b = {(r.doc_id, r.shard, r.pack_id, r.pack_off)
         for r in export.pack_sequences(d, 500, "n_tokens", n_shards=4).collect()}
    assert a == b
    assert len({s for _, s, _, _ in a}) == 4


def test_stratified_sample_exact_and_reproducible(spark):
    from unstract_spark.operators.export import stratified_sample

    rows = [(i, "a" if i < 40 else "b", i % 2) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, src string, bucket int")
    out = stratified_sample(df, ["src", "bucket"], 7, id_col="doc_id")
    got = out.collect()
    from collections import Counter
    sizes = Counter((r.src, r.bucket) for r in got)
    # strata a/0 and a/1 have 20 each -> capped at 7;
    # b/0 and b/1 have 5 each -> kept whole
    assert sizes[("a", 0)] == 7 and sizes[("a", 1)] == 7
    assert sizes[("b", 0)] == 5 and sizes[("b", 1)] == 5
    # reproducible across runs; salt changes membership
    again = {r.doc_id for r in stratified_sample(df, ["src", "bucket"], 7).collect()}
    assert again == {r.doc_id for r in got}
    salted = {
        r.doc_id
        for r in stratified_sample(df, ["src", "bucket"], 7, salt="s2").collect()
    }
    assert salted != again  # 2^-160-ish chance of collision


def test_zorder_layout_shrinks_file_bounding_boxes(spark, tmp_path):
    """The point of Z-ordering: after the layout transform, each
    written file covers a small bounding BOX in (x, y), so parquet
    min/max stats prune files for predicates on EITHER column. Gate:
    the mean per-file box area under the zorder layout is far below
    the hash-shuffled layout's (which spreads every file across the
    whole domain)."""
    import pyspark.sql.functions as F

    from unstract_spark.operators.export import zorder_layout

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        ((F.col("id") * 2654435761) % 128).alias("y"),
    )

    def mean_box_area(path):
        got = spark.read.parquet(path).withColumn(
            "f", F.input_file_name()
        )
        rows = (
            got.groupBy("f")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        return sum(r.sx * r.sy for r in rows) / len(rows)

    base = str(tmp_path / "plain")
    df.repartition(8).write.parquet(base)
    zpath = str(tmp_path / "z")
    zorder_layout(df, "x", "y", bits=7, n_files=8).write.parquet(zpath)

    plain_area = mean_box_area(base)
    z_area = mean_box_area(zpath)
    # hash layout: every file spans ~the whole 128x128 domain (~16k);
    # zorder: ~n_files^-1 of the curve -> box area shrinks by ~8x
    assert z_area < plain_area / 4, (plain_area, z_area)
    # row content untouched by the layout
    assert spark.read.parquet(zpath).count() == n


def test_compaction_plan_sequential_fill_and_straddle(spark):
    from pyspark.sql import functions as F
    from unstract_spark.operators.export import compaction_plan

    # target 100: ids 1..5 sized 60,60,60,30,100
    # cum_before: 0,60,120,180,210 -> bins 0,0,1,1,2
    # (file 2 straddles the 100 boundary and stays in bin 0)
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 60), (4, 30), (5, 100)], "fid int, sz int"
    )
    got = {
        r.fid: r.bin_id
        for r in compaction_plan(df, "fid", "sz", target_bytes=100).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2}
    # bins respect id order, so each bin is a contiguous id range
    sizes = compaction_plan(df, "fid", "sz", 100).groupBy("bin_id").agg(
        F.sum("bytes").alias("b")
    )
    assert {r.bin_id: r.b for r in sizes.collect()} == {0: 120, 1: 90, 2: 100}


def test_hilbert_distance_matches_reference(spark):
    """Pin the unrolled walk to the textbook xy2d implementation AND
    the locality property that justifies Hilbert over Morton:
    consecutive curve positions are always adjacent cells."""
    from unstract_spark.operators.export import hilbert_distance

    def ref_xy2d(order, x, y):
        d = 0
        s = order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    n = 16  # 4 bits/dim, full 16x16 grid
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "hx int, hy int")
    got = {
        (r.hx, r.hy): r.hilbert
        for r in hilbert_distance(df, "hx", "hy", bits=4).collect()
    }
    assert got == {(x, y): ref_xy2d(n, x, y) for x, y in pts}
    # bijection onto [0, 256) and unit-step adjacency
    inv = {d: xy for xy, d in got.items()}
    assert sorted(inv) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
