"""Derived PARTSUPP relation — partsupp-grade TPC-H fidelity over the
reduced schema.

The synthetic testdata carries no partsupp table, so the reference
TPC-H plan shapes that hinge on it (Q2's scalar-subquery min-cost
supplier, Q11's stock-value fractions, Q16's part-supplier counts,
Q20's availqty threshold) were first shipped as reduced-schema
variants.  This module restores the real shapes by MATERIALIZING the
(part, supplier) grain from lineitem:

    ps_partkey, ps_suppkey   the relation's key
    ps_availqty              exact decimal sum of shipped quantity
                             (the stock-level stand-in)
    ps_supplycost            min observed unit price
                             (l_extendedprice / l_quantity — a per-row
                             IEEE division, bit-identical on any
                             engine, so min and equality join-backs
                             are exact; NEVER summed — double sums are
                             association-order dependent)
    ps_value                 exact decimal sum of extended price (the
                             Q11 stock-value stand-in; decimal so the
                             0.08% national-fraction boundary is
                             deterministic cross-engine)

Scale design: the derivation is ONE map-side-combinable groupBy on the
(l_partkey, l_suppkey) key — uniform keys, no skew.  For repeated use,
`materialize` writes it BUCKETED by ps_partkey so every later
part-side join (Q2/Q11/Q16/Q20 all probe by part) runs sort-merge with
ZERO exchanges against a same-bucketed part table — at 100 TB the
difference between re-shuffling the fact-derived relation per query
and reading co-located buckets (tests/test_bucketing.py asserts the
exchange-free plan).

SQL twin: PS_SQL is the DuckDB CTE body computing the identical
relation for the oracle gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# DuckDB CTE body — keep in lockstep with derive()
PS_SQL = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               sum(CAST(l_quantity AS DECIMAL(18,6))) AS ps_availqty,
               min(l_extendedprice / l_quantity) AS ps_supplycost,
               sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS ps_value
        FROM lineitem GROUP BY 1, 2
"""


def derive(lineitem: DataFrame) -> DataFrame:
    """lineitem -> the (part, supplier) grain with exact aggregates."""
    return lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("ps_availqty"),
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias(
            "ps_value"
        ),
    )


def materialize(
    spark,
    sf_dir: str,
    table: str = "ps.partsupp_b",
    buckets: int = 8,
) -> None:
    """Write the derived relation bucketed+sorted by ps_partkey so
    part-probing joins are exchange-free sort-merge joins against a
    same-bucketed part table.  Bucket count must match the partner
    table's (Spark only elides the shuffle when counts align)."""
    db = table.split(".")[0]
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    (
        derive(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
        .write.bucketBy(buckets, "ps_partkey")
        .sortBy("ps_partkey")
        .mode("overwrite")
        .saveAsTable(table)
    )
