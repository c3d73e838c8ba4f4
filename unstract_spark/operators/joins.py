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
    ts_bucket: float | None = None,
    tolerance: float | None = None,
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

    Skew: `partitionBy(key)` serializes each key's full history into
    one task — fine when keys are balanced, fatal for a power-law hot
    key (one entity with 100M events). Pass `ts_bucket` (a timestamp
    width in the ts column's units) to switch to the range-chunked
    plan: rows partition by `(key, floor(ts / ts_bucket))`, a tiny
    per-(key, bucket) boundary pass computes each bucket's carry-in
    (latest right row before the bucket / earliest after), and the
    window then runs per bucket — max task size is bounded by rows per
    (key, bucket), never by rows per key. Results are identical to the
    unchunked plan for any bucket width.

    Determinism contract: callers must ensure right is unique per
    (key, ts) — at equal timestamps the carried payload would otherwise
    be order-dependent on BOTH engines. At equal left/right ts the
    right row IS visible (inclusive both directions), enforced by
    sorting right before left within a timestamp.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    if ts_bucket is not None and not ts_bucket > 0:
        raise ValueError(f"ts_bucket must be > 0, got {ts_bucket!r}")
    if tolerance is not None and not tolerance >= 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance!r}")
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
    if ts_bucket is not None:
        return _asof_chunked(
            unioned, left.columns, key, payload, suffix, direction,
            float(ts_bucket), tolerance,
        )
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
    pick = _apply_tolerance(pick, payload, direction, tolerance)
    out = carried.filter(F.col("_is_right") == 0)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[pick[c].alias(f"{c}{suffix}") for c in payload],
    )


def _apply_tolerance(pick, payload, direction, tolerance):
    """Null the match when it lies farther than `tolerance` from the
    left timestamp (the pandas merge_asof tolerance semantic). Uses the
    carried _b_ts/_f_ts columns both plans compute; a missing match has
    a NULL carried ts, so the condition stays NULL -> no change."""
    if tolerance is None:
        return pick
    if direction == "backward":
        ok = (F.col("_ts") - F.col("_b_ts")) <= tolerance
    elif direction == "forward":
        ok = (F.col("_f_ts") - F.col("_ts")) <= tolerance
    else:
        db = F.col("_ts") - F.col("_b_ts")
        df_ = F.col("_f_ts") - F.col("_ts")
        use_b = F.col("_f_ts").isNull() | (F.col("_b_ts").isNotNull() & (db <= df_))
        ok = F.when(use_b, db).otherwise(df_) <= tolerance
    return {c: F.when(ok, pick[c]) for c in payload}


def _asof_chunked(
    unioned: DataFrame,
    left_cols: list[str],
    key: str,
    payload: list[str],
    suffix: str,
    direction: str,
    bucket: float,
    tolerance: float | None = None,
) -> DataFrame:
    """Range-chunked as-of plan (skew-safe): windows run per
    (key, ts_bucket), seeded by a per-bucket boundary pass.

    Three steps, all bounded:
    1. Per-(key, bucket) boundary aggregate over the union — for each
       payload column, the value of the latest/earliest right row in
       the bucket whose value is non-null (per-field, matching the
       flat plan's `last(..., ignorenulls)` fall-through), plus the
       bucket's last/first right timestamp. One row per occupied
       (key, bucket): the frame is tiny relative to the input.
    2. A window over that boundary frame (partitioned by key, ordered
       by bucket) turns per-bucket boundaries into carry-in (latest
       right strictly before the bucket) and carry-out (earliest right
       strictly after). The hot key contributes n_buckets rows here,
       not n_rows.
    3. Join the carries back on (key, bucket) and run the directional
       window per (key, bucket), coalescing to the carried boundary
       when the bucket has no qualifying right row. Max task size is
       rows-per-(key, bucket) — the caller bounds it via the bucket
       width, independent of key skew.
    """
    bkt = F.floor(F.col("_ts") / F.lit(bucket)).cast("long")
    u = unioned.withColumn("_bkt", bkt)
    is_r = F.col("_is_right") == 1

    # 1 — per-bucket boundaries (nulls in a payload column fall through
    # to the previous right row with a value, exactly like the flat
    # plan's last(..., ignorenulls) over all preceding rows)
    aggs = [
        F.max(F.when(is_r, F.col("_ts"))).alias("_lastts"),
        F.min(F.when(is_r, F.col("_ts"))).alias("_firstts"),
    ]
    for c in payload:
        has_v = is_r & F.col(f"_p_{c}").isNotNull()
        aggs.append(
            F.max_by(F.col(f"_p_{c}"), F.when(has_v, F.col("_ts"))).alias(f"_lastv_{c}")
        )
        aggs.append(
            F.min_by(F.col(f"_p_{c}"), F.when(has_v, F.col("_ts"))).alias(
                f"_firstv_{c}"
            )
        )
    bounds = u.groupBy(key, "_bkt").agg(*aggs)

    # 2 — carries across buckets (strictly-before / strictly-after)
    w_in = (
        Window.partitionBy(key)
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_out = (
        Window.partitionBy(key)
        .orderBy(F.col("_bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_cols = [
        F.last("_lastts", ignorenulls=True).over(w_in).alias("_cin_ts"),
        F.last("_firstts", ignorenulls=True).over(w_out).alias("_cout_ts"),
    ]
    for c in payload:
        carry_cols.append(
            F.last(f"_lastv_{c}", ignorenulls=True).over(w_in).alias(f"_cin_{c}")
        )
        carry_cols.append(
            F.last(f"_firstv_{c}", ignorenulls=True).over(w_out).alias(f"_cout_{c}")
        )
    carries = bounds.select(key, "_bkt", *carry_cols)

    # 3 — per-bucket windows seeded by the carries
    seeded = u.join(carries, [key, "_bkt"])
    wb = (
        Window.partitionBy(key, "_bkt")
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key, "_bkt")
        .orderBy(F.col("_ts").desc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rts = F.when(is_r, F.col("_ts"))

    def carry(w, tag, fallback):
        cols = [
            F.coalesce(
                F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w),
                F.col(f"_{fallback}_{c}"),
            ).alias(f"_{tag}_{c}")
            for c in payload
        ]
        cols.append(
            F.coalesce(
                F.last(rts, ignorenulls=True).over(w), F.col(f"_{fallback}_ts")
            ).alias(f"_{tag}_ts")
        )
        return cols

    if direction == "backward":
        carried = seeded.select("*", *carry(wb, "b", "cin"))
        pick = {c: F.col(f"_b_{c}") for c in payload}
    elif direction == "forward":
        carried = seeded.select("*", *carry(wf, "f", "cout"))
        pick = {c: F.col(f"_f_{c}") for c in payload}
    else:
        carried = seeded.select("*", *carry(wb, "b", "cin"), *carry(wf, "f", "cout"))
        db = F.col("_ts") - F.col("_b_ts")
        df_ = F.col("_f_ts") - F.col("_ts")
        use_b = F.col("_f_ts").isNull() | (F.col("_b_ts").isNotNull() & (db <= df_))
        pick = {
            c: F.when(use_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
            for c in payload
        }
    pick = _apply_tolerance(pick, payload, direction, tolerance)
    out = carried.filter(F.col("_is_right") == 0)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left_cols],
        *[pick[c].alias(f"{c}{suffix}") for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    max_bins: int = 10_000,
) -> DataFrame:
    """Inner interval join: left rows matched to every right interval
    with lo <= value <= hi (inclusive both ends).

    Right intervals explode to ceil(width/bin_width)+1 bins; the left
    side computes ONE bin; equi-join on bin then the exact BETWEEN
    re-check. A (left, interval) pair meets in exactly one bin (the
    left row's), so no post-join dedup is needed.

    Fan-out guard: one degenerate interval spanning the domain would
    explode to domain/bin_width rows and silently dominate the job, so
    any interval wider than `max_bins` bins raises — the caller either
    picks a coarser bin_width or raises the cap knowingly. The guard
    is an EAGER one-aggregate pass over the intervals side at build
    time: an in-plan raise_error guard is non-deterministic, which
    poisons size estimation for the whole subtree and flips the join's
    broadcast side (measured 3x on the bench). One extra linear scan
    of the (smaller, by design) intervals table buys a pristine join
    plan and a failure that's loud before the big side is ever read.
    """
    bw = float(bin_width)
    if not bw > 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width!r}")
    if max_bins < 1:
        raise ValueError(f"max_bins must be >= 1, got {max_bins!r}")
    lo_bin = F.floor(F.col(lo_col) / bw).cast("long")
    hi_bin = F.floor(F.col(hi_col) / bw).cast("long")
    widest = right.agg(F.max(hi_bin - lo_bin).alias("mx")).collect()[0]["mx"]
    if widest is not None and widest >= max_bins:
        raise ValueError(
            f"range_join interval spans {int(widest) + 1} bins at "
            f"bin_width={bw} (max_bins={max_bins}); pick a coarser "
            f"bin_width or raise max_bins"
        )
    r_binned = right.select(
        "*",
        F.explode(F.sequence(lo_bin, hi_bin)).alias("_bin"),
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    max_bins: int = 10_000,
    overlap_col: str = "overlap",
) -> DataFrame:
    """Interval-x-interval join: every (left, right) pair whose
    [lo, hi] ranges overlap (inclusive), with the overlap length —
    the time-weighted attribution/billing primitive (how long was
    session X inside maintenance window Y).

    Both sides explode to their fixed-width bins and meet in an
    equi-join; a pair overlapping k bins would surface k times, so a
    row is kept only in the FIRST bin of its overlap
    (bin == floor(max(lo_l, lo_r) / width)) — exactly-once without a
    distinct. Same eager `max_bins` fan-out guard as range_join, on
    BOTH sides.
    """
    bw = float(bin_width)
    if not bw > 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width!r}")
    if max_bins < 1:
        raise ValueError(f"max_bins must be >= 1, got {max_bins!r}")

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        lo_bin = F.floor(F.col(lo) / bw).cast("long")
        hi_bin = F.floor(F.col(hi) / bw).cast("long")
        widest = df.agg(F.max(hi_bin - lo_bin).alias("mx")).collect()[0]["mx"]
        if widest is not None and widest >= max_bins:
            raise ValueError(
                f"interval_overlap_join interval spans {int(widest) + 1} "
                f"bins at bin_width={bw} (max_bins={max_bins})"
            )
        return df.select(
            "*", F.explode(F.sequence(lo_bin, hi_bin)).alias("_bin")
        )

    l_b = binned(left, left_lo, left_hi)
    r_b = binned(right, right_lo, right_hi)
    start = F.greatest(F.col(left_lo), F.col(right_lo))
    end = F.least(F.col(left_hi), F.col(right_hi))
    return (
        l_b.join(r_b, "_bin")
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (F.col("_bin") == F.floor(start / bw).cast("long"))
        )
        .withColumn(overlap_col, end - start)
        .drop("_bin")
    )


def scd2_join(
    facts: DataFrame,
    versions: DataFrame,
    key_col: str,
    fact_ts: str,
    valid_from: str,
    version_cols: tuple[str, ...] = (),
    how: str = "left",
    tie_break: str | None = None,
) -> DataFrame:
    """Point-in-time (SCD Type 2) join: each fact row picks the
    dimension version active at its timestamp.

    `versions` carries (key, valid_from, payload...); validity is
    derived, not stored: valid_to = the key's NEXT valid_from
    (lead window, half-open [from, to)), so the version table can be
    append-only — the standard slowly-changing-dimension layout.
    Facts before a key's first version get NULL payloads under
    how="left" (the honest answer; "inner" drops them).

    Determinism contract: (key, valid_from) must identify ONE version
    row, or `tie_break` must name a column (e.g. a version id) that
    breaks the tie.  With two versions at the same (key, valid_from)
    and no tie_break, lead() ordering is nondeterministic — WHICH
    payload gets the non-empty validity interval (the other collapses
    to an empty [t, t) interval) can differ run to run, so facts at
    that instant could pick different versions across runs/engines.

    Scale shape: ONE window pass over versions per key (version
    tables are small relative to facts), then an equi-join on the key
    with the validity range INSIDE the join condition — the join
    evaluates versions-per-key candidates per fact and emits exactly 1
    (validity intervals partition time; a range predicate as a
    post-join filter would instead drop the null-extended rows the
    left contract promises). No window ever runs over the fact side. A hot key costs
    (its facts x its versions) — bounded by the dimension's churn,
    not the corpus; keys with pathological churn belong in asof_join's
    ts_bucket chunked plan instead.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    order = [F.col(valid_from).asc()]
    if tie_break is not None:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    v = versions.select(
        F.col(key_col).alias("_vkey"),
        F.col(valid_from).alias("version_from"),
        F.lead(valid_from).over(w).alias("version_to"),
        *[F.col(c) for c in version_cols],
    )
    # ONE join: equi on the key, validity range as a join predicate
    # (not a post-filter — in a left join a filter would drop the
    # null-extended rows the contract promises)
    cond = (
        (facts[key_col] == v["_vkey"])
        & (facts[fact_ts] >= v["version_from"])
        & (v["version_to"].isNull() | (facts[fact_ts] < v["version_to"]))
    )
    return facts.join(v, cond, how).drop("_vkey")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join by SALTING: the classic fix when one join
    key carries a disproportionate share of the fact rows and a plain
    shuffle join funnels them into a single straggler task.

    Facts get a deterministic per-row salt (md5 of the whole row's
    key + a stable intra-partition discriminator is unnecessary —
    spark_partition_id + a monotonic row id would break retry
    determinism, so the salt derives from the row's own key hashed
    with a per-row uniform: pmod(xxhash64(key, rand-free columns), n)
    would be ideal, but xxhash64 over the full row is overkill;
    monotonically_increasing_id is NOT used because it changes across
    retries). Here the salt is pmod(xxhash64(all fact columns), n) —
    deterministic in the DATA, so retried tasks re-derive identical
    salts. The dim side replicates n_salts times (dims are small by
    definition — that is why the key is skewed on the fact side), and
    the join runs on (key, salt): the hot key's rows spread over
    n_salts tasks.

    AQE's skew-join split handles MODERATE skew automatically
    (SCALE.md); explicit salting is for the pathological key that
    exceeds a single task even after AQE splits, or engines/configs
    without AQE. Results are row-identical to the plain join (pytest).

    Known limitation (deliberate): BYTE-IDENTICAL duplicate fact rows
    all hash to the same salt, so a template flood of exact copies of
    one row still funnels into a single task — data-derived salting
    cannot separate indistinguishable rows without a row index, and
    row indexes (monotonically_increasing_id, partition id) change
    across task retries, silently corrupting retried partitions. For
    exact-duplicate-heavy facts, pre-aggregate the duplicates first —
    facts.groupBy(<all cols>).count() — join the distinct rows, and
    re-expand by the count (or keep the weighted form); that both
    fixes the skew and shrinks the join input.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    f = facts.withColumn("_salt", salt)
    reps = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    d = dim.withColumn("_salt", reps)
    out = f.join(d, [on, "_salt"], how)
    return out.drop("_salt")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed snapshot DIFF (change-data-capture between two table
    versions): one row per key that was added, removed, or changed,
    with the comma-joined list of columns whose value differs
    (null-safe — a value appearing or disappearing counts as a
    change). Unchanged keys are dropped. The incremental-refresh
    primitive a periodically re-crawled / re-exported corpus needs:
    feed the diff, not the snapshot, to downstream re-embedding or
    re-indexing.

    `compare_cols` defaults to every non-key column present in BOTH
    frames. Output: keys + status ('added'|'removed'|'changed') +
    changed_cols (empty string for added/removed — the absent side has
    no values to compare).

    Scale shape: ONE full-outer shuffle join on the key — the minimal
    plan for a diff (both snapshots cross the wire once; bucketed or
    co-partitioned snapshots make it shuffle-free). Column comparisons
    are codegen'd null-safe equals, no UDFs; the changed-column list
    is concat_ws over per-column CASEs, identical in the SQL twin via
    IS DISTINCT FROM."""
    cmp = compare_cols or [
        c for c in old.columns if c not in keys and c in new.columns
    ]
    o = old.select(
        *keys, *[F.col(c).alias(f"_o_{c}") for c in cmp]
    ).withColumn("_in_old", F.lit(1))
    n = new.select(
        *keys, *[F.col(c).alias(f"_n_{c}") for c in cmp]
    ).withColumn("_in_new", F.lit(1))
    j = o.join(n, keys, "full_outer")
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    changed = F.concat_ws(
        ",",
        *[
            F.when(
                ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
            )
            for c in cmp
        ],
    )
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    out = j.select(
        *keys,
        status.alias("status"),
        F.when(in_old & in_new, changed).otherwise(F.lit("")).alias(
            "changed_cols"
        ),
    )
    return out.filter(
        (F.col("status") != "changed") | (F.col("changed_cols") != "")
    )


def key_skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Join/groupBy KEY-SKEW diagnostic: the top_n heaviest keys with
    their integer-exact share and skew factor — the "do I need
    salted_join / AQE skew split?" probe, runnable BEFORE paying for
    the skewed shuffle it warns about.

    Output per heavy key: (key, cnt, share_ppm, skew_x1000, n_keys,
    total_rows) where share_ppm = cnt·1e6 div total (parts-per-million
    of all rows) and skew_x1000 = cnt·1000·n_keys div total (the key's
    multiple of the mean key load, x1000). All integer division — no
    float in the gate path. (Headroom note: cnt·1e6 needs cnt ≤ ~9e12
    before BIGINT binds — comfortably beyond per-key row counts that
    any single reducer could hold anyway.)

    Scale shape: ONE map-side-combining groupBy(key) builds the count
    table (the aggregate a skewed key cannot hurt — partials absorb
    it), a 1-row global aggregate broadcasts total/n_keys, and the
    heavy hitters come from TakeOrdered(top_n) with a key tie-break.
    Nothing else shuffles.

    Oracle-parity caveat: a NULL key that ties on cnt exactly at the
    top_n boundary orders engine-specifically (Spark sorts nulls
    first ascending, DuckDB last) — hash-gated uses of this report
    should feed a null-free key or pin NULLS FIRST in the twin."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    top = counts.orderBy(F.desc("cnt"), "k").limit(top_n)
    return top.crossJoin(F.broadcast(stats)).select(
        F.col("k").alias(key_col),
        "cnt",
        F.expr("cnt * 1000000 div total_rows").alias("share_ppm"),
        F.expr("cnt * 1000 * n_keys div total_rows").alias("skew_x1000"),
        "n_keys",
        "total_rows",
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    order_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Gaps-and-islands: merge overlapping-or-touching intervals per
    key into maximal islands (the classic coverage primitive — uptime
    windows, session coalescing, byte-range compaction planning).

    An interval starts a NEW island iff its start exceeds the running
    maximum of all previous ends (window, rows to -1); the island id
    is the running sum of those flags; one aggregate then folds each
    island. Overlap alone is not transitive — the running-max
    formulation is what makes the island relation's transitive
    closure come out of ONE window pass instead of an iterative join.

    Inputs must be integer-domain (epoch micros, byte offsets):
    min/max/sums stay exact, so the output hash-gates. Touching
    intervals (start == previous end) merge.

    Scale shape: one shuffle by key; the window and the final
    aggregate both reuse that partitioning. Per-key interval count is
    unbounded — no per-key collect anywhere.

    Output: (key, island BIGINT 1-based, island_start, island_end,
    n_intervals, covered) with covered = island_end - island_start.
    """
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(start_col, order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(start_col, order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pmax = F.max(end_col).over(w_prev)
    flag = F.when(
        pmax.isNull() | (F.col(start_col) > pmax), F.lit(1)
    ).otherwise(F.lit(0))
    with_island = df.withColumn("_flag", flag).withColumn(
        "island", F.sum("_flag").over(w_run).cast("long")
    )
    # weight_col lets a caller fold PRE-MERGED islands back in as
    # single rows that still count their original interval
    # multiplicity (the streaming twin's open-island carry)
    n = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(weight_col).cast("long")
    )
    return with_island.groupBy(key_col, "island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        n.alias("n_intervals"),
        (F.max(end_col) - F.min(start_col)).alias("covered"),
    )


def basket_pair_stats(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Market-basket pair co-occurrence with support / confidence /
    lift — the association-rule primitive (Agrawal & Srikant's Apriori
    at the pair level, the only level a first-pass recommender needs).

    Plan: distinct (basket, item) once (one shuffle), then a
    SELF-equi-join on basket with item_a < item_b — the pair space is
    bounded by the per-basket item count (quadratic in basket SIZE,
    never in basket count), the same per-entity contract as the
    sessionizers. Per-item counts and the basket total join back onto
    the pair aggregate; the scalar total rides a broadcast.

    All counters exact BIGINTs; confidence and lift are each ONE IEEE
    division of integer products (cross-engine bit-stable):
    lift > 1 means the pair co-occurs more than independence predicts.

    Output: (item_a, item_b, pair_cnt, cnt_a, cnt_b, n_baskets,
    support_ppm, conf_a_b, lift).
    """
    b = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    item_cnt = b.groupBy(F.col("_i").alias("_item")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    total = b.select("_b").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    left = b.select(F.col("_b"), F.col("_i").alias("item_a"))
    right = b.select(F.col("_b").alias("_b2"), F.col("_i").alias("item_b"))
    pairs = (
        left.join(
            right,
            (left["_b"] == right["_b2"])
            & (left["item_a"] < right["item_b"]),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_pair_count)
    )
    ca = item_cnt.select(
        F.col("_item").alias("item_a"), F.col("_cnt").alias("cnt_a")
    )
    cb = item_cnt.select(
        F.col("_item").alias("item_b"), F.col("_cnt").alias("cnt_b")
    )
    out = (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(total))
    )
    return out.select(
        "item_a",
        "item_b",
        "pair_cnt",
        "cnt_a",
        "cnt_b",
        "n_baskets",
        F.expr("pair_cnt * 1000000 div n_baskets").alias("support_ppm"),
        (F.col("pair_cnt").cast("double") / F.col("cnt_a")).alias(
            "conf_a_b"
        ),
        (
            (F.col("pair_cnt") * F.col("n_baskets")).cast("double")
            / (F.col("cnt_a") * F.col("cnt_b")).cast("double")
        ).alias("lift"),
    )


def changelog_apply(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog to a snapshot — the MERGE INTO / compacted-
    topic materialization every lakehouse table format performs:
    `changes` carries (key, seq, op in {'I','U','D'}, payload...); per
    key only the LATEST change by `seq` wins (row_number window over
    the changelog — sized by churn, never by the base table), then

    - latest op D        -> key dropped,
    - latest op I/U      -> change payload replaces / inserts,
    - no change for key  -> base row passes through (anti-join).

    The base table is touched by exactly ONE anti-join on the DISTINCT
    changed keys (broadcastable when churn is small — the common case
    this operator exists for); it is never windowed or re-sorted.
    Sequence ties are the changelog producer's bug, not resolvable
    here: `seq` must be unique per key (assert upstream); the window
    breaks ties by op desc then deterministically, documented so
    replays are stable.

    Output: the new snapshot with the base schema (key + payload).
    """
    payload = [c for c in base.columns if c != key_col]
    w = Window.partitionBy(key_col).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = latest.filter(F.col(op_col) != "D").select(
        key_col, *payload
    )
    changed_keys = latest.select(key_col)
    untouched = base.join(changed_keys, key_col, "left_anti")
    return untouched.unionByName(survivors)


def pareto_front_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
) -> DataFrame:
    """2-D Pareto frontier (skyline): the rows not dominated under
    (minimize `min_col`, maximize `max_col`) — a row is dominated by
    any other that is <= on min_col and >= on max_col with at least
    one strict. The multi-objective selection primitive (cheapest-
    but-largest, newest-but-highest-quality) that naive SQL spells as
    an O(n^2) NOT EXISTS self-join.

    Distributed spelling (the classic partition-local-skyline merge,
    2-D case): range-partition on min_col — equal keys co-locate, so
    earlier partitions are STRICTLY cheaper — then per partition two
    RANGE-frame window maxima give the strictly-cheaper and
    cheap-or-equal running records, and a P-row exclusive prefix max
    across partition totals (tiny theta-join over P rows) carries the
    cross-partition record. Every window is partitioned; nothing
    funnels through one task.

    `min_col` must be integer-domain (quantize money to cents
    upstream): the strictly-cheaper RANGE frame uses offset -1.
    Duplicate (min, max) points do not dominate each other — both
    survive, matching the NOT EXISTS semantics.
    """
    P = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    t = df.repartitionByRange(P, F.col(min_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_lt = (
        Window.partitionBy("_pid")
        .orderBy(F.col(min_col))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.partitionBy("_pid")
        .orderBy(F.col(min_col))
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    local = t.withColumn("_max_lt", F.max(max_col).over(w_lt)).withColumn(
        "_max_le", F.max(max_col).over(w_le)
    )
    totals = t.groupBy("_pid").agg(F.max(max_col).alias("_pmax"))
    earlier = totals.select(
        F.col("_pid").alias("_epid"), F.col("_pmax")
    )
    prefix = (
        totals.select("_pid")
        .join(earlier, F.col("_epid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.max("_pmax").alias("_prev_pmax"))
    )
    s = F.col(max_col)
    dominated = (
        (F.coalesce(F.col("_prev_pmax") >= s, F.lit(False)))
        | (F.coalesce(F.col("_max_lt") >= s, F.lit(False)))
        | (F.col("_max_le") > s)
    )
    return (
        local.join(F.broadcast(prefix), "_pid")
        .filter(~dominated)
        .drop("_pid", "_max_lt", "_max_le", "_prev_pmax")
    )


def scd2_build(
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    ts_col: str,
) -> DataFrame:
    """Build an SCD TYPE 2 dimension from a changelog — the
    write-side complement of scd2_join (which CONSUMES such a table):
    every change row becomes a version with validity
    [ts, next change's ts), the latest version per key left open
    (valid_to NULL), version numbers assigned in change order.

    One window over the changelog (churn-sized, never a base-table
    scan): lead(ts) closes each version, row_number numbers it.
    `seq_col` breaks same-timestamp ties deterministically; pairs
    with changelog_apply (same input contract) when only the LATEST
    snapshot is wanted.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(seq_col).asc()
    )
    return (
        changes.withColumn("version", F.row_number().over(w))
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn(
            "is_current", F.col("valid_to").isNull()
        )
    )
