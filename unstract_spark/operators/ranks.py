"""Distributed global order statistics: row_number / running sums over
a total order WITHOUT a single-partition window.

A global ``row_number() OVER (ORDER BY ...)`` (or running sum) funnels
the whole table through ONE task — fine at sf0.1, a scale-killer at
100x (the r7 verdict's four perf-weak diagnostics all had this shape).
The distributed spelling is the classic two-pass prefix sum:

  1. range-repartition on the order key (P contiguous, sorted ranges),
  2. per-partition local window (partitionBy the partition id) for the
     local rank / local running sums — P-way parallel,
  3. prefix-sum the P per-partition totals into exclusive offsets,
  4. broadcast-join the offsets back and add.

Everything stays in ONE query, and the per-partition-totals branch is
constructed to be PLAN-IDENTICAL to the join-back branch so AQE's
stage cache serves both from ONE materialized range shuffle.  That
reuse is what makes the sampled range boundaries (hence ``_pid``)
provably consistent across branches: RangePartitioner's boundary
sampling is seeded per-RDD, so a re-executed copy of the exchange may
draw DIFFERENT boundaries — offsets computed against one partitioning
and applied to another silently corrupt every rank.

Plan-identity is enforced structurally: the helper REQUIRES the input
frame to contain only the order and sum columns, so Catalyst's column
pruning cannot specialize one branch's exchange subtree away from the
other's.  (Value-neutral "reference every column" guard expressions
were tried first and are a trap: a non-nullable ``0 * xxhash64(...)``
is constant-folded away, silently re-opening the divergence.)  Payload
columns ride along as TRAILING order keys — the order is already total
without them, so appending them changes neither the order nor the
result — or get equi-joined back on the unique key afterwards.  A
pytest asserts the executed plan materializes exactly one
rangepartitioning exchange, including under a column-pruning consumer.

Determinism does not depend on where the sampled boundaries land: the
caller supplies a TOTAL order (tie-break columns included), so
``local rank + offset`` is the exact global rank for any contiguous
partitioning of that order.  Running sums are exact only for
integer/decimal sum columns (double addition would be
partitioning-order dependent) — hash-gated outputs must quantize
first, per the repo-wide float-parity rules.

Reference parity note: the reference platform computes these order
statistics on a single node (Django ORM aggregates /
pandas-in-a-worker, e.g. usage reports in
unstract/backend/usage_v2/helper.py), where "global order" is free;
on a 1000-executor cluster it has to be spelled distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_prefix(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: tuple[str, ...] = (),
    *,
    partitions: int | None = None,
    rank_col: str | None = "rnk",
    cum_prefix: str = "cum_",
) -> DataFrame:
    """Add a global row number (``rank_col``) and/or inclusive running
    sums (``cum_<c>`` for each c in ``sum_cols``) over the total order
    given by ``order_cols`` — distributed across P range partitions.

    Contract (each violation raises):
    - ``order_cols`` must be a total order (include a unique
      tie-break); with ties the global rank would depend on boundary
      placement.  Plain ascending column names only — materialize
      computed sort keys as columns first.
    - ``df`` must contain ONLY ``order_cols`` + ``sum_cols``: extra
      payload columns would let column pruning specialize one internal
      branch's range exchange (breaking cross-branch partitioning
      consistency — see module docstring).  Append payload columns as
      trailing order keys (the order is already total, so they change
      nothing) or join payload back on the unique key afterwards.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    keep = list(order_cols) + [c for c in sum_cols if c not in order_cols]
    extra = [c for c in df.columns if c not in keep]
    if extra:
        raise ValueError(
            f"range_prefix: payload columns {extra} would break "
            "cross-branch plan identity — append them as trailing "
            "order keys or join them back on the unique order key"
        )
    P = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    t = df.repartitionByRange(P, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )

    w = Window.partitionBy("_pid").orderBy(*order_cols)
    wr = w.rowsBetween(Window.unboundedPreceding, 0)
    local = t.select(
        "*",
        F.row_number().over(w).alias("_lrnk"),
        *[F.sum(c).over(wr).alias(f"_lcum_{c}") for c in sum_cols],
    )

    # Per-partition totals (last local rank / last local cumsum) from
    # the SAME window subtree as the join-back branch — both branches
    # demand the identical column set by construction, so the stage
    # cache reuses one materialized range shuffle for both.
    totals = local.groupBy("_pid").agg(
        F.max("_lrnk").alias("_bcnt"),
        *[
            F.max_by(f"_lcum_{c}", "_lrnk").alias(f"_btot_{c}")
            for c in sum_cols
        ],
    )
    b = totals.withColumnRenamed("_pid", "_bpid")
    # Exclusive offsets: the probe side is the STATIC pid domain
    # 0..P-1 (no data dependency — nothing to re-execute or prune),
    # each pid summing the broadcast totals of strictly-lower pids.
    pids = (
        df.sparkSession.range(P)
        .select(F.col("id").cast("int").alias("_pid"))
    )
    offsets = (
        pids.join(F.broadcast(b), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(
            F.coalesce(F.sum("_bcnt"), F.lit(0)).alias("_roff"),
            *[
                F.sum(f"_btot_{c}").alias(f"_soff_{c}")
                for c in sum_cols
            ],
        )
    )

    out = local.join(F.broadcast(offsets), "_pid")
    if rank_col:
        out = out.withColumn(rank_col, F.col("_roff") + F.col("_lrnk"))
    for c in sum_cols:
        out = out.withColumn(
            f"{cum_prefix}{c}",
            F.coalesce(F.col(f"_soff_{c}"), F.lit(0)) + F.col(f"_lcum_{c}"),
        )
    drop = ["_pid", "_lrnk", "_roff"] + [
        n for c in sum_cols for n in (f"_lcum_{c}", f"_soff_{c}")
    ]
    return out.drop(*drop)


def grouped_doubled_ranks(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out: str = "r2",
) -> DataFrame:
    """Per-GROUP tie-averaged DOUBLED ranks, computed distributed.

    2·avg_rank(v) = 2·cnt_less + cnt_eq + 1 — always an integer (the
    agg_mann_whitney device), so rank statistics stay in the exact
    domain. The naive spelling, rank() OVER (PARTITION BY group ORDER
    BY value), sorts each group's whole slice in ONE task — a 3-value
    group column means the corpus sorts on 3 tasks however many
    executors exist (the r12 10x rung read 15x on 10x rows for
    exactly this reason). Distributed spelling: counts per
    (group, value), ONE range_prefix over the COMPOSITE
    (group, value) order — P-way parallel regardless of group count —
    then the within-group cumulative is the global cumulative minus
    the group's exclusive offset (its first value's cum − cnt, a
    groups-sized aggregate broadcast back).

    Output: one row per distinct (group, value) with `out` = the
    doubled average rank within its group — join back to the fact
    rows on (group, value)."""
    g = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rp = range_prefix(
        g, [group_col, value_col], sum_cols=("cnt",), rank_col=None
    )
    goff = rp.groupBy(group_col).agg(
        F.min(F.col("cum_cnt") - F.col("cnt")).alias("_goff")
    )
    return (
        rp.join(F.broadcast(goff), group_col)
        .withColumn(
            out,
            (
                2 * (F.col("cum_cnt") - F.col("_goff") - F.col("cnt"))
                + F.col("cnt") + 1
            ).cast("long"),
        )
        .select(group_col, value_col, out)
    )
