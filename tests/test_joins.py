"""As-of and range join operators (operators/joins.py).

The corpus gates are j7_asof_join / j8_range_join; these pin the
semantics on handcrafted rows: backward-inclusive matching, pre-match
nulls, per-key isolation, interval inclusivity and bin-boundary cases.
"""

from unstract_spark.operators.joins import asof_join, range_join


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, 5, 10), (1, 15, 11), (1, 20, 12), (2, 7, 13)],
        "k long, ts long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 18, 101), (2, 9, 102)],
        "k long, ts long, snap long",
    )
    out = {
        r.lid: r.snap_matched
        for r in asof_join(left, right, "k", "ts", "ts", ["snap"]).collect()
    }
    assert out[10] == 100  # equal ts: inclusive
    assert out[11] == 100  # 15 -> latest at 5
    assert out[12] == 101  # 20 -> latest at 18
    assert out[13] is None  # key 2 first snapshot is AFTER ts 7


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame([(1, 50, 1), (2, 50, 2)], "k long, ts long, lid long")
    right = spark.createDataFrame([(1, 10, 900)], "k long, ts long, snap long")
    out = {
        r.lid: r.snap_matched
        for r in asof_join(left, right, "k", "ts", "ts", ["snap"]).collect()
    }
    assert out[1] == 900 and out[2] is None


def test_range_join_inclusive_bounds_and_bins(spark):
    left = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 10.5), (4, 20.0), (5, 25.0)],
        "lid long, v double",
    )
    # overlapping intervals; bounds land exactly on bin edges
    right = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 10.0, 20.0), (300, 5.0, 25.0)],
        "rid long, lo double, hi double",
    )
    out = {
        (r.lid, r.rid)
        for r in range_join(left, right, "v", "lo", "hi", bin_width=4.0).collect()
    }
    assert out == {
        (1, 100),
        (2, 100), (2, 200), (2, 300),  # 10.0 inclusive on both edges
        (3, 200), (3, 300),
        (4, 200), (4, 300),            # 20.0 inclusive
        (5, 300),
    }
    # no duplicate (left, interval) pairs despite multi-bin intervals
    rows = range_join(left, right, "v", "lo", "hi", bin_width=4.0).collect()
    assert len(rows) == len(out)


def test_asof_forward_and_nearest(spark):
    left = spark.createDataFrame(
        [(1, 10, 1), (1, 14, 2), (1, 30, 3), (2, 5, 4)],
        "k long, ts long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 16, 101), (2, 9, 102)],
        "k long, ts long, snap long",
    )

    fwd = {
        r.lid: r.snap_matched
        for r in asof_join(left, right, "k", "ts", "ts", ["snap"],
                           direction="forward").collect()
    }
    assert fwd[1] == 101  # 10 -> next at 16
    assert fwd[2] == 101
    assert fwd[3] is None  # nothing after 30
    assert fwd[4] == 102  # 5 -> next at 9

    near = {
        r.lid: r.snap_matched
        for r in asof_join(left, right, "k", "ts", "ts", ["snap"],
                           direction="nearest").collect()
    }
    assert near[1] == 100  # |10-8|=2 < |16-10|=6
    assert near[2] == 101  # |14-16|=2 < |14-8|=6
    assert near[3] == 101  # only earlier rows exist
    assert near[4] == 102


def test_asof_nearest_tie_goes_backward(spark):
    left = spark.createDataFrame([(1, 10, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 12, 101)], "k long, ts long, snap long"
    )
    (r,) = asof_join(
        left, right, "k", "ts", "ts", ["snap"], direction="nearest"
    ).collect()
    assert r.snap_matched == 100  # equidistant: backward wins


def test_asof_unknown_direction_raises(spark):
    import pytest

    left = spark.createDataFrame([(1, 1, 1)], "k long, ts long, lid long")
    with pytest.raises(ValueError):
        asof_join(left, left, "k", "ts", "ts", ["lid"], direction="sideways")


def test_asof_chunked_matches_flat_all_directions(spark):
    """Chunked (skew-safe) plan is result-identical to the flat plan for
    every direction, across bucket widths that split / don't split the
    data, including carry-across-empty-bucket cases."""
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(rng.randrange(3), rng.randrange(1000), i) for i in range(300)],
        "k long, ts long, lid long",
    )
    # right must be unique per (key, ts) — the operator's determinism
    # contract (duplicates make BOTH plans order-dependent)
    seen: dict[tuple[int, int], int] = {}
    for i in range(40):
        seen.setdefault((rng.randrange(3), rng.randrange(1000)), 100 + i)
    right = spark.createDataFrame(
        [(k, t, s) for (k, t), s in seen.items()], "k long, ts long, snap long"
    )
    for direction in ("backward", "forward", "nearest"):
        flat = {
            r.lid: r.snap_matched
            for r in asof_join(
                left, right, "k", "ts", "ts", ["snap"], direction=direction
            ).collect()
        }
        for bucket in (7.0, 100.0, 5000.0):
            chunked = {
                r.lid: r.snap_matched
                for r in asof_join(
                    left, right, "k", "ts", "ts", ["snap"],
                    direction=direction, ts_bucket=bucket,
                ).collect()
            }
            assert chunked == flat, (direction, bucket)


def test_asof_chunked_null_payload_falls_through(spark):
    """A right row whose payload value is NULL must fall through to the
    previous right row's value (flat-plan last(..., ignorenulls)
    semantics) — including across a bucket boundary."""
    left = spark.createDataFrame([(1, 100, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 10, 7), (1, 90, None)], "k long, ts long, snap long"
    )
    for bucket in (None, 50.0):
        (r,) = asof_join(
            left, right, "k", "ts", "ts", ["snap"], ts_bucket=bucket
        ).collect()
        assert r.snap_matched == 7, bucket


def test_asof_chunked_bounds_hot_key_partitions(spark):
    """One key holding 90% of rows: the chunked plan's window partitions
    are (key, bucket), so the max rows any single window task sees is
    bounded by rows-per-bucket, not rows-per-key."""
    from pyspark.sql import functions as F

    n = 2000
    rows = [(0, i, i) for i in range(n - 100)] + [
        (k, i * 13 % 1000, 10_000 + i) for k in (1, 2) for i in range(50)
    ]
    left = spark.createDataFrame(rows, "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(0, t, t) for t in range(0, 2000, 40)], "k long, ts long, snap long"
    )
    bucket = 100.0
    # the plan's window partition key cardinality: every (k, bucket) group
    # must stay under the bucket's row capacity even for the hot key
    grouped = (
        left.groupBy("k", F.floor(F.col("ts") / bucket).alias("b"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert grouped <= 101  # bounded by bucket width, NOT by the 1900-row key
    flat = {
        r.lid: r.snap_matched
        for r in asof_join(left, right, "k", "ts", "ts", ["snap"]).collect()
    }
    chunked = {
        r.lid: r.snap_matched
        for r in asof_join(
            left, right, "k", "ts", "ts", ["snap"], ts_bucket=bucket
        ).collect()
    }
    assert chunked == flat


def test_asof_bad_bucket_raises(spark):
    import pytest

    left = spark.createDataFrame([(1, 1, 1)], "k long, ts long, lid long")
    with pytest.raises(ValueError, match="ts_bucket"):
        asof_join(left, left, "k", "ts", "ts", ["lid"], ts_bucket=0)


def test_range_join_bin_width_validation(spark):
    import pytest

    left = spark.createDataFrame([(1, 1.0)], "lid long, v double")
    right = spark.createDataFrame([(1, 0.0, 2.0)], "rid long, lo double, hi double")
    for bad in (0, -1.5):
        with pytest.raises(ValueError, match="bin_width"):
            range_join(left, right, "v", "lo", "hi", bin_width=bad)
    with pytest.raises(ValueError, match="max_bins"):
        range_join(left, right, "v", "lo", "hi", bin_width=1.0, max_bins=0)


def test_range_join_max_bins_guard_is_loud(spark):
    """A degenerate interval spanning the domain raises instead of
    silently exploding to domain/bin_width rows."""
    import pytest

    left = spark.createDataFrame([(1, 5.0)], "lid long, v double")
    right = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 0.0, 1e9)], "rid long, lo double, hi double"
    )
    with pytest.raises(Exception, match="max_bins"):
        range_join(left, right, "v", "lo", "hi", bin_width=1.0, max_bins=100).collect()
    # same data passes once the cap admits the wide interval
    ok = range_join(
        left, right, "v", "lo", "hi", bin_width=1e7, max_bins=1000
    ).collect()
    assert {r.rid for r in ok} == {1, 2}


def test_asof_chunked_matches_flat_property(spark):
    """Hypothesis-style randomized sweep (seeded loop — a spark fixture
    inside @given re-runs the session per example): random key/ts
    distributions including heavy ties and sparse buckets, all three
    directions, random bucket widths — chunked == flat every time."""
    import random

    for trial in range(6):
        rng = random.Random(100 + trial)
        n_keys = rng.choice([1, 2, 5])
        left = spark.createDataFrame(
            [
                (rng.randrange(n_keys), rng.randrange(60), i)
                for i in range(rng.choice([5, 40, 120]))
            ],
            "k long, ts long, lid long",
        )
        seen = {}
        for i in range(rng.choice([3, 25])):
            seen.setdefault((rng.randrange(n_keys), rng.randrange(60)), 200 + i)
        right = spark.createDataFrame(
            [(k, t, s) for (k, t), s in seen.items()],
            "k long, ts long, snap long",
        )
        direction = rng.choice(["backward", "forward", "nearest"])
        bucket = rng.choice([1.0, 3.5, 17.0, 1000.0])
        flat = {
            r.lid: r.snap_matched
            for r in asof_join(
                left, right, "k", "ts", "ts", ["snap"], direction=direction
            ).collect()
        }
        chunked = {
            r.lid: r.snap_matched
            for r in asof_join(
                left, right, "k", "ts", "ts", ["snap"],
                direction=direction, ts_bucket=bucket,
            ).collect()
        }
        assert chunked == flat, (trial, direction, bucket)


def test_interval_overlap_join_exactly_once_and_lengths(spark):
    from unstract_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0.0, 30.0), (2, 50.0, 55.0), (3, 100.0, 101.0)],
        "l_id long, l_lo double, l_hi double",
    )
    right = spark.createDataFrame(
        [(10, 10.0, 20.0),   # inside interval 1, spans 3 bins at bw=4
         (20, 29.0, 52.0),   # overlaps 1 AND 2
         (30, 200.0, 210.0)],  # overlaps nothing
        "r_id long, r_lo double, r_hi double",
    )
    rows = interval_overlap_join(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", bin_width=4.0
    ).collect()
    got = {(r.l_id, r.r_id): r.overlap for r in rows}
    assert got == {(1, 10): 10.0, (1, 20): 1.0, (2, 20): 2.0}
    assert len(rows) == len(got)  # exactly-once despite multi-bin overlaps


def test_interval_overlap_guards(spark):
    import pytest

    from unstract_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame([(1, 0.0, 1.0)], "l_id long, l_lo double, l_hi double")
    wide = spark.createDataFrame(
        [(9, 0.0, 1e9)], "r_id long, r_lo double, r_hi double"
    )
    with pytest.raises(ValueError, match="bin_width"):
        interval_overlap_join(left, wide, "l_lo", "l_hi", "r_lo", "r_hi", 0)
    with pytest.raises(ValueError, match="max_bins"):
        interval_overlap_join(
            left, wide, "l_lo", "l_hi", "r_lo", "r_hi", 1.0, max_bins=100
        )


def test_asof_tolerance_all_directions_and_chunked(spark):
    """merge_asof tolerance semantics: a match farther than the budget
    nulls out; identical on flat and chunked plans."""
    import pytest

    left = spark.createDataFrame(
        [(1, 100, 1), (1, 200, 2)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(1, 95, 10), (1, 250, 20)], "k long, ts long, snap long"
    )
    for bucket in (None, 30.0):
        back = {
            r.lid: r.snap_matched
            for r in asof_join(
                left, right, "k", "ts", "ts", ["snap"],
                tolerance=10, ts_bucket=bucket,
            ).collect()
        }
        assert back[1] == 10      # |100-95| = 5 <= 10
        assert back[2] is None    # backward match at 95 is 105 away
        fwd = {
            r.lid: r.snap_matched
            for r in asof_join(
                left, right, "k", "ts", "ts", ["snap"],
                direction="forward", tolerance=60, ts_bucket=bucket,
            ).collect()
        }
        assert fwd[1] is None     # next at 250 is 150 away
        assert fwd[2] == 20       # 50 <= 60
        near = {
            r.lid: r.snap_matched
            for r in asof_join(
                left, right, "k", "ts", "ts", ["snap"],
                direction="nearest", tolerance=5, ts_bucket=bucket,
            ).collect()
        }
        assert near[1] == 10      # nearest is 5 away, at budget
        assert near[2] is None    # nearest (250) is 50 away
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, "k", "ts", "ts", ["snap"], tolerance=-1)


def test_salted_join_matches_plain_join(spark):
    """Salting is a LAYOUT transform: results are row-identical to the
    plain join for inner and left joins, including a pathologically
    hot key, and the join actually runs on (key, salt)."""
    from unstract_spark.operators.joins import salted_join

    facts = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 900), (3, 901), (5, 902)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "unused")], "k long, name string"
    )
    for how in ("inner", "left"):
        want = sorted(
            (r.k, r.payload, r.name)
            for r in facts.join(dim, "k", how).collect()
        )
        got_df = salted_join(facts, dim, "k", n_salts=4, how=how)
        got = sorted((r.k, r.payload, r.name) for r in got_df.collect())
        assert got == want, how
    plan = salted_join(facts, dim, "k", n_salts=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "_salt" in plan


def test_snapshot_diff_statuses_and_changed_cols(spark):
    from unstract_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 21), (4, "d", 40), (5, "e", 50)],
        "k int, s string, v int",
    )
    got = {
        r.k: (r.status, r.changed_cols)
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # k=1 unchanged -> absent; k=2 both cols changed; k=3 removed;
    # k=4 null -> value is a CHANGE (null-safe compare); k=5 added
    assert got == {
        2: ("changed", "s,v"),
        3: ("removed", ""),
        4: ("changed", "s"),
        5: ("added", ""),
    }


def test_snapshot_diff_compare_cols_subset(spark):
    from unstract_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame([(1, "a", 10)], "k int, s string, v int")
    new = spark.createDataFrame([(1, "a", 99)], "k int, s string, v int")
    # restricting the compared columns to s makes the row unchanged
    assert snapshot_diff(old, new, ["k"], ["s"]).count() == 0
    full = snapshot_diff(old, new, ["k"]).collect()
    assert [(r.status, r.changed_cols) for r in full] == [("changed", "v")]


def test_key_skew_report_integer_math_and_tiebreak(spark):
    from unstract_spark.operators.joins import key_skew_report

    # key "a" x6, "b" x2, "c" x2 -> total 10, n_keys 3
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_report(df, "k", top_n=2).collect()
    assert [(r.k, r.cnt, r.share_ppm, r.skew_x1000) for r in got] == [
        ("a", 6, 600000, 1800),  # 6/10 of rows, 1.8x the mean key load
        ("b", 2, 200000, 600),  # tie with c broken by key order
    ]
    assert all(r.n_keys == 3 and r.total_rows == 10 for r in got)


def test_merge_intervals_islands(spark):
    """Touching intervals merge; a gap of 1 splits; chained overlap
    (a-b overlap, b-c overlap, a-c don't) folds into ONE island —
    the transitive-closure property the running max provides."""
    from unstract_spark.operators.joins import merge_intervals

    rows = [
        # key 1: [0,10] [10,20] touch -> one island; [25,30] separate
        (1, 1, 0, 10), (1, 2, 10, 20), (1, 3, 25, 30),
        # key 2: chained [0,10] [8,18] [16,26] -> one island 0..26
        (2, 4, 0, 10), (2, 5, 8, 18), (2, 6, 16, 26),
        # key 2: contained interval [30,50] swallows [35,40]
        (2, 7, 30, 50), (2, 8, 35, 40), (2, 9, 49, 60),
    ]
    df = spark.createDataFrame(rows, "k int, id int, s long, e long")
    got = {
        (r.k, r.island): (r.island_start, r.island_end,
                          r.n_intervals, r.covered)
        for r in merge_intervals(df, "k", "s", "e", "id").collect()
    }
    assert got == {
        (1, 1): (0, 20, 2, 20),
        (1, 2): (25, 30, 1, 5),
        (2, 1): (0, 26, 3, 26),
        (2, 2): (30, 60, 3, 30),
    }


def test_triangle_count_degree_ordered(spark):
    """Two triangles sharing an edge count every vertex once per
    triangle; a star has none; a hub's triangle is found even though
    the hub itself generates no wedges (orientation points INTO it)."""
    from unstract_spark.operators.graph import triangle_count

    edges = [
        (1, 2), (2, 3), (1, 3), (3, 4), (2, 4),   # two triangles
        (10, 11), (10, 12), (10, 13),              # star: none
        (20, 21), (20, 22), (20, 23), (20, 24), (20, 25), (20, 26),
        (21, 22),                                  # hub triangle
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.n_triangles for r in triangle_count(df).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 1, 20: 1, 21: 1, 22: 1}


def test_triangle_count_large_graph_path_matches(spark):
    """The size-gated join strategy (r14): broadcast_edges_max=0 forces
    the large-graph SHUFFLE_HASH branch; counts must equal the
    broadcast branch's and the plan must carry ShuffledHashJoin (no
    SortMergeJoin fallback)."""
    import contextlib
    import io

    from unstract_spark.operators.graph import triangle_count

    edges = [
        (1, 2), (2, 3), (1, 3), (3, 4), (2, 4),
        (20, 21), (20, 22), (21, 22),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    small = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    big_path = triangle_count(df, broadcast_edges_max=0)
    large = {r.node: r.n_triangles for r in big_path.collect()}
    assert small == large
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        big_path.explain("formatted")
    plan = buf.getvalue()
    assert "ShuffledHashJoin" in plan and "SortMergeJoin" not in plan


def test_changelog_apply_merge_semantics(spark):
    from unstract_spark.operators.joins import changelog_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, val string"
    )
    ch = spark.createDataFrame(
        [
            (2, 1, "U", "b2"), (2, 5, "U", "b5"),   # latest seq wins
            (3, 1, "D", None),                        # delete
            (4, 1, "I", "d1"), (4, 2, "D", None),    # insert then delete
            (5, 9, "I", "e9"),                        # plain insert
        ],
        "k long, seq long, op string, val string",
    )
    got = {r.k: r.val for r in changelog_apply(base, ch, "k", "seq").collect()}
    assert got == {1: "a", 2: "b5", 5: "e9"}


def test_pareto_front_2d_dominance(spark):
    """Frontier semantics: duplicates both survive, equal-price
    smaller-size is dominated, and the cross-partition record carries
    (many partitions force the prefix-max merge path)."""
    from unstract_spark.operators.joins import pareto_front_2d

    pts = [
        (1, 10, 100), (2, 10, 100),   # duplicate frontier points
        (3, 10, 90),                   # equal price, smaller -> out
        (4, 20, 150), (5, 20, 150),
        (6, 30, 150),                  # pricier, same size -> out
        (7, 5, 40),                    # cheapest -> in
        (8, 50, 200),                  # largest -> in
        (9, 60, 199),                  # out (8 dominates)
    ]
    df = spark.createDataFrame(pts, "id long, price long, size long")
    got = {
        r.id for r in pareto_front_2d(df, "price", "size").collect()
    }
    assert got == {1, 2, 4, 5, 7, 8}


def test_kcore_peel_cascades(spark):
    """Peeling must CASCADE: removing a leaf can drop its neighbor
    below k next round. A 4-clique with a pendant path survives as
    exactly the clique at k=3 within 3 rounds."""
    from unstract_spark.operators.graph import kcore_peel

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    path = [(4, 5), (5, 6)]  # 5 and 6 peel in cascade
    df = spark.createDataFrame(clique + path, "src long, dst long")
    got = {r.node: r.deg for r in kcore_peel(df, k=3, rounds=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_tree_root_depth_forest(spark):
    """Pointer doubling resolves a multi-root forest with a chain
    deeper than one round could reach (depth 6 > 2^2), and roots
    report themselves at depth 0."""
    from unstract_spark.operators.graph import tree_root_depth

    # forest: chain 1<-2<-3<-4<-5<-6<-7 (root 1); star 10<-{11,12}
    rows = [(1, 1), (2, 1), (3, 2), (4, 3), (5, 4), (6, 5), (7, 6),
            (10, 10), (11, 10), (12, 10)]
    df = spark.createDataFrame(rows, "node long, parent long")
    got = {
        r.node: (r.root, r.depth)
        for r in tree_root_depth(df, rounds=3).collect()
    }
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 2), 4: (1, 3),
                   5: (1, 4), 6: (1, 5), 7: (1, 6),
                   10: (10, 0), 11: (10, 1), 12: (10, 1)}


def test_personalized_pagerank_empty_effective_seeds_raises(spark):
    """Seeds absent from the edge list make n_seeds = 0; `SCALE div 0`
    is NULL under non-ANSI Spark — every score silently NULL (r11
    ADVICE). The operator must fail loudly instead."""
    import pytest

    from unstract_spark.operators.graph import personalized_pagerank_fixed

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    ghosts = spark.createDataFrame([(99,), (100,)], "node long")
    with pytest.raises(ValueError, match="seed"):
        personalized_pagerank_fixed(edges, ghosts, iters=1)

    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = personalized_pagerank_fixed(edges, seeds, iters=1).collect()
    assert all(r.ppr_fixed is not None for r in got)


def test_weighted_pagerank_proportional_split(spark):
    """Weights steer the mass: a hub pointing at two neighbors with
    weights 3:1 must give the heavy neighbor exactly 3x the
    contribution (same integer fixed-point arithmetic as the base
    variant), and equal weights must reproduce the unweighted
    ranking."""
    from unstract_spark.operators.graph import (
        SCALE,
        pagerank_fixed,
        weighted_pagerank_fixed,
    )

    edges = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1)], "src long, dst long, w long"
    )
    got = {
        r.node: r.wpr_fixed
        for r in weighted_pagerank_fixed(edges, iters=1).collect()
    }
    # undirected: node 1 has wsum 4; nodes 2/3 return all their mass
    p0 = SCALE // 3
    base = SCALE // (8 * 3)
    assert got[2] == base + (7 * ((p0 * 3) // 4 + 0)) // 8
    assert got[3] == base + (7 * ((p0 * 1) // 4 + 0)) // 8
    assert got[2] > got[3]

    # equal weights == unweighted (deg split equals weight split)
    eq = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5), (3, 1, 5)], "src long, dst long, w long"
    )
    got_w = {
        r.node: r.wpr_fixed
        for r in weighted_pagerank_fixed(eq, iters=2).collect()
    }
    got_u = {
        r.node: r.pr_fixed
        for r in pagerank_fixed(
            eq.select("src", "dst"), iters=2
        ).collect()
    }
    assert got_w == got_u
