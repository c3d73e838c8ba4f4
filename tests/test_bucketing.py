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

def test_partsupp_materialized_bucketed_join_no_exchange(spark, sf_dir):
    """The derived partsupp relation (operators/partsupp.py)
    materialized bucketed by ps_partkey joins a same-bucketed part
    table with ZERO exchanges — the co-location contract Q2/Q11/Q16/
    Q20 rely on when the relation is reused across queries."""
    import shutil

    from unstract_spark.operators import partsupp

    spark.sql("CREATE DATABASE IF NOT EXISTS ps")
    try:
        partsupp.materialize(spark, sf_dir, table="ps.partsupp_b", buckets=8)
        (
            spark.read.parquet(f"{sf_dir}/part.parquet")
            .write.bucketBy(8, "p_partkey").sortBy("p_partkey")
            .mode("overwrite").saveAsTable("ps.part_b")
        )
        psb = spark.table("ps.partsupp_b")
        pb = spark.table("ps.part_b")
        j = psb.hint("merge").join(pb, psb.ps_partkey == pb.p_partkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # the materialized relation matches the inline derivation
        inline = partsupp.derive(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        )
        assert psb.count() == inline.count()
        assert (
            psb.join(
                inline,
                ["ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost",
                 "ps_value"],
            ).count()
            == inline.count()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS ps.partsupp_b")
        spark.sql("DROP TABLE IF EXISTS ps.part_b")
        spark.sql("DROP DATABASE IF EXISTS ps")
        shutil.rmtree("spark-warehouse/ps.db", ignore_errors=True)
