"""As-of and range joins — the time-series joins Spark lacks natively.

The reference has no time-series surface at all (its joins are the
file-pipeline anti/semi joins, SURVEY §2.6); these are the custom
operators the training-telemetry side of the engine needs (match an
event to the latest profile snapshot; band a metric into overlapping
ranges) expressed in shapes that survive 100 TB:

- **As-of** is NOT a theta join here. The naive spelling
  (`l JOIN r ON l.key = r.key AND r.ts <= l.ts` + arg-max) explodes to
  every earlier snapshot per event before pruning. Instead both sides
  union into ONE frame and a single window pass per key carries the
  most recent right payload forward (`last_value ... IGNORE NULLS`) —
  one shuffle on the key, zero fan-out, which is exactly how
  merge-as-of works in columnar time-series engines.
- **Range** is NOT a cartesian-filter. Intervals explode to the
  fixed-width bins they overlap, the probe side computes its single
  bin, and the join is an equi-join on bin + exact BETWEEN re-check —
  bounded fan-out (interval_width/bin_width per interval), the
  standard bin-bucketed interval-join trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    suffix: str = "_matched",
) -> DataFrame:
    """Backward inclusive as-of: each left row gains the payload of the
    right row with the greatest right_ts <= left_ts for its key (nulls
    when no snapshot precedes it).

    Determinism contract: callers must ensure right is unique per
    (key, ts) — at equal timestamps the carried payload would otherwise
    be order-dependent on BOTH engines. At equal left/right ts the
    right row IS visible (inclusive), enforced by sorting right before
    left within a timestamp.
    """
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_p_{c}") for c in payload],
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload
        ],
    )
    out = carried.filter(F.col("_is_right") == 0)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"{c}{suffix}") for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner interval join: left rows matched to every right interval
    with lo <= value <= hi (inclusive both ends).

    Right intervals explode to ceil(width/bin_width)+1 bins; the left
    side computes ONE bin; equi-join on bin then the exact BETWEEN
    re-check. A (left, interval) pair meets in exactly one bin (the
    left row's), so no post-join dedup is needed.
    """
    bw = float(bin_width)
    r_binned = right.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("long"),
                F.floor(F.col(hi_col) / bw).cast("long"),
            )
        ).alias("_bin"),
    )
    l_binned = left.select(
        "*", F.floor(F.col(value_col) / bw).cast("long").alias("_bin")
    )
    return (
        l_binned.join(r_binned, "_bin")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )
