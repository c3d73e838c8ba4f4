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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains the payload of its matching
    right row for the key — `direction`:

    - "backward" (default): greatest right_ts <= left_ts
    - "forward": smallest right_ts >= left_ts
    - "nearest": whichever of the two is closer in |ts|; exact ties go
      backward (the pandas merge_asof convention)

    Nulls when no right row qualifies. Both directional passes are
    windows over ONE union frame partitioned by the key — "nearest"
    costs a second sort, never a second shuffle or any fan-out.

    Determinism contract: callers must ensure right is unique per
    (key, ts) — at equal timestamps the carried payload would otherwise
    be order-dependent on BOTH engines. At equal left/right ts the
    right row IS visible (inclusive both directions), enforced by
    sorting right before left within a timestamp.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
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
    unioned = l_tag.unionByName(r_tag)
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").desc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rts = F.when(F.col("_is_right") == 1, F.col("_ts"))

    def carry(w, tag):
        cols = [
            F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(f"_{tag}_{c}")
            for c in payload
        ]
        cols.append(F.last(rts, ignorenulls=True).over(w).alias(f"_{tag}_ts"))
        return cols

    if direction == "backward":
        carried = unioned.select("*", *carry(wb, "b"))
        pick = {c: F.col(f"_b_{c}") for c in payload}
    elif direction == "forward":
        carried = unioned.select("*", *carry(wf, "f"))
        pick = {c: F.col(f"_f_{c}") for c in payload}
    else:
        carried = unioned.select("*", *carry(wb, "b"), *carry(wf, "f"))
        db = F.col("_ts") - F.col("_b_ts")
        df_ = F.col("_f_ts") - F.col("_ts")
        use_b = F.col("_f_ts").isNull() | (F.col("_b_ts").isNotNull() & (db <= df_))
        pick = {
            c: F.when(use_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
            for c in payload
        }
    out = carried.filter(F.col("_is_right") == 0)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[pick[c].alias(f"{c}{suffix}") for c in payload],
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
