"""range_prefix: distributed global rank / running sums.

The dangerous failure mode is SILENT: if the internal
per-partition-totals branch re-executes the range exchange instead of
reusing it, RangePartitioner may sample different boundaries and the
offsets no longer describe the partitioning the local ranks were
computed under — every rank shifts, no error.  So besides value
parity (including under a column-pruning consumer, which is what broke
the first two implementations), these tests assert the executed-plan
invariant directly: exactly ONE rangepartitioning exchange
materializes per range_prefix call.
"""

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from unstract_spark.operators.ranks import range_prefix


def _executed_range_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    return len(re.findall(r"\+- Exchange rangepartitioning", final))


def _frame(spark):
    return spark.range(0, 5000).select(
        (F.col("id") % 97).alias("k"),
        "id",
        ((F.col("id") * 7919) % 1000 - 300).alias("v"),
    )


def _expected(df):
    w = Window.orderBy("k", "id")
    return df.select(
        "k",
        "id",
        F.row_number().over(w).alias("rnk"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_v"),
    )


def test_rank_and_cumsum_parity(spark):
    df = _frame(spark)
    got = range_prefix(df, ["k", "id"], ("v",))
    a = {(r.k, r.id): (r.rnk, r.cum_v) for r in got.collect()}
    e = {(r.k, r.id): (r.rnk, r.cum_v) for r in _expected(df).collect()}
    assert a == e
    assert _executed_range_exchanges(got) == 1


def test_parity_under_column_pruning_consumer(spark):
    """A consumer that keeps only a subset of columns makes Catalyst
    prune the join-back branch — the exact condition that silently
    desynchronized earlier implementations' branch exchanges."""
    df = _frame(spark)
    got = range_prefix(df, ["k", "id"], ("v",)).select("id", "rnk")
    a = {r.id: r.rnk for r in got.collect()}
    e = {r.id: r.rnk for r in _expected(df).select("id", "rnk").collect()}
    assert a == e
    assert _executed_range_exchanges(got) == 1


def test_rank_only_and_sum_only_modes(spark):
    df = _frame(spark)
    ranked = range_prefix(
        df.select("k", "id"), ["k", "id"], rank_col="pos"
    )
    rn = sorted(r.pos for r in ranked.collect())
    assert rn == list(range(1, 5001))

    summed = range_prefix(df, ["k", "id"], ("v",), rank_col=None)
    assert "rnk" not in summed.columns
    e = {
        (r.k, r.id): r.cum_v
        for r in _expected(df).select("k", "id", "cum_v").collect()
    }
    a = {(r.k, r.id): r.cum_v for r in summed.collect()}
    assert a == e


def test_payload_columns_rejected(spark):
    df = _frame(spark).withColumn("payload", F.lit("x"))
    with pytest.raises(ValueError, match="payload"):
        range_prefix(df, ["k", "id"], ("v",))


def test_empty_input(spark):
    df = _frame(spark).filter(F.lit(False))
    got = range_prefix(df, ["k", "id"], ("v",))
    assert got.count() == 0


def test_negative_and_decimal_sums(spark):
    df = (
        _frame(spark)
        .select(
            "k", "id", F.col("v").cast("decimal(18,2)").alias("v")
        )
    )
    got = range_prefix(df, ["k", "id"], ("v",))
    w = Window.orderBy("k", "id")
    e = df.select(
        "id",
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_v"),
    )
    a = {r.id: r.cum_v for r in got.select("id", "cum_v").collect()}
    exp = {r.id: r.cum_v for r in e.collect()}
    assert a == exp


def test_grouped_doubled_ranks_matches_window_spelling(spark):
    """The distributed per-group doubled ranks equal the naive
    window spelling's integers exactly — ties averaged, groups
    independent, singleton and heavy-tie groups included."""
    from pyspark.sql import Window

    from unstract_spark.operators.ranks import grouped_doubled_ranks

    rows = [("a", v) for v in [5, 5, 5, 1, 9, 9]]
    rows += [("b", v) for v in [2]]
    rows += [("c", v) for v in [7, 7, 3, 3, 3, 3, 10]]
    df = spark.createDataFrame(rows, "g string, v long")

    got = {
        (r.g, r.v): r.r2
        for r in grouped_doubled_ranks(df, "g", "v").collect()
    }
    w = Window.partitionBy("g").orderBy("v")
    expect = {
        (r.g, r.v): r.r2
        for r in df.select(
            "g", "v",
            (2 * F.rank().over(w).cast("long")
             + F.count(F.lit(1)).over(Window.partitionBy("g", "v")) - 1
             ).alias("r2"),
        ).distinct().collect()
    }
    assert got == expect
    # spot values: group a ties {5,5,5} at positions 2-4 -> avg 3 ->
    # doubled 6; singleton group b -> rank 1 -> doubled 2
    assert got[("a", 5)] == 6
    assert got[("b", 2)] == 2
