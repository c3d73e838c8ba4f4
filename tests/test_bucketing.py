"""Bucketing co-location: the shuffle-free join strategy for repeated
big-table joins (SCALE.md §joins). Writing both sides bucketed on the
join key lets sort-merge join run with ZERO exchanges — at 100 TB this
is the difference between re-shuffling the fact table per query and
reading co-located buckets."""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("CREATE DATABASE IF NOT EXISTS bt")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bt.lineitem_b")
    )
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bt.orders_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bt.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bt.orders_b")
    spark.sql("DROP DATABASE IF EXISTS bt")
    shutil.rmtree("spark-warehouse/bt.db", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    l = spark.table("bt.lineitem_b")
    o = spark.table("bt.orders_b")
    # force SMJ (broadcast would bypass bucketing at this tiny sf)
    j = l.hint("merge").join(o, l.l_orderkey == o.o_orderkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located buckets: zero shuffles
    # and the join is still correct
    assert j.count() == l.join(o, l.l_orderkey == o.o_orderkey).count()


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join on plain parquet shuffles both sides."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = l.hint("merge").join(o, l.l_orderkey == o.o_orderkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan