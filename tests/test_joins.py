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
