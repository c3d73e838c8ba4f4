"""One-pass TABLE PROFILING: per-column stats for data-quality gates.

A landing-zone audit ("did the export land complete? did a column go
all-null? did cardinality collapse?") wants one row per column with
row/null/distinct counts, min/max, and mean rendered length — cheap
enough to run after every load, exact enough to gate on.

Design: UNPIVOT-FIRST. One `stack()` expand turns each row into N
narrow (col_name, rendered_value) tuples — still ONE scan of the
table — then two hash aggregates finish the job: a pre-aggregate on
(col_name, value) collapses duplicates with counts (map-side partials
absorb heavy values), and a per-col_name aggregate derives every
statistic from the collapsed groups (n_distinct is just count(value)
once each distinct value is one row — no count(DISTINCT) rewrite).

The tempting alternative — one wide agg with N count(DISTINCT)s —
plans as Spark's grouping-id Expand with all N columns in the
grouping key and string min/max buffers, which falls off
HashAggregate onto SortAggregate end to end (the minhash lesson).
And ANY declarative string aggregate (min/max/min_by/max_by over v)
in the final aggregate re-triggers the same fallback — so min/max
come from a col_name-partitioned WINDOW over the collapsed groups
(the dd_keep_longest idiom; WindowExec sorts its own partition,
which the audit sanctions) and then ride the final HashAggregate as
GROUPING KEYS (constant per partition, and string grouping keys are
hash-aggregable — only buffers must be fixed-width).

Semantics: values are profiled by their STRING RENDERING
(CAST(c AS STRING)) — min/max are lexicographic over renderings and
identical across engines for integer and string columns; native-typed
min/max are one plain .agg() away when needed. avg_len is the
decimal-domain mean rendered length over NON-NULL values (SQL twin:
round(CAST(sum(CAST(length(CAST(c AS VARCHAR)) AS DECIMAL(18,6)))
AS DOUBLE) / count(c), 6)).

Reference anchor: the reference surfaces per-run file counts in its
workflow execution models (backend/workflow_manager/workflow_v2/
models/execution.py) but has no relational profiler; this is part of
the beyond-reference pipeline toolkit, with the KMV sketches
(operators/sketches.py) as the estimate path when exact per-column
distincts are too expensive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile `cols` in one scan: one output row per column with
    (col_name, n_rows, n_null, n_distinct, min_str, max_str,
    avg_len). avg_len is NULL for an all-null column."""
    from pyspark.sql import Window

    pairs = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    unp = df.selectExpr(f"stack({len(cols)}, {pairs}) as (col_name, v)")
    g1 = unp.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("col_name")
    g1 = g1.withColumn("min_str", F.min("v").over(w)).withColumn(
        "max_str", F.max("v").over(w)
    )
    vnn = F.col("v").isNotNull()
    g2 = g1.groupBy("col_name", "min_str", "max_str").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(~vnn, F.col("cnt")).otherwise(F.lit(0))).alias(
            "n_null"
        ),
        F.count("v").alias("n_distinct"),
        F.sum(
            F.when(
                vnn, F.length("v").cast("decimal(18,6)") * F.col("cnt")
            )
        ).alias("_sl"),
        F.sum(F.when(vnn, F.col("cnt")).otherwise(F.lit(0))).alias("_nn"),
    )
    avg_len = F.when(
        F.col("_nn") == 0, F.lit(None).cast("double")
    ).otherwise(F.round(F.col("_sl").cast("double") / F.col("_nn"), 6))
    return g2.select(
        "col_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_str",
        "max_str",
        avg_len.alias("avg_len"),
    )


def expectation_report(
    df: DataFrame,
    checks: list[tuple],
    unique_cols: list[str] | None = None,
    reference: tuple | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Declarative DATA-QUALITY EXPECTATIONS in one scan (the
    constraint-suite shape popularized by Deequ / Great Expectations):
    `checks` is a list of (name, violation_condition Column); every
    condition folds into ONE wide aggregate of CASE sums — fixed-width
    buffers, so the whole suite is a single map-side-combining pass
    over the table however many constraints it carries.

    `unique_cols` adds a uniqueness expectation priced inside the SAME
    aggregate as count(*) - count(DISTINCT cols) (duplicate-row
    count). `reference` = (ref_df, left_key, right_key) adds a
    referential-integrity expectation via a left-anti join (the only
    check that genuinely needs a second input).

    Output: (check_name, n_checked, n_violations, status) — one row
    per expectation; status is 'pass'/'fail'. All counters exact
    BIGINTs, so the report hash-gates.

    A violation condition that evaluates NULL counts as NOT violated
    (CASE semantics, identical across engines) — write null-aware
    conditions when nulls should fail a check.

    `key_col` opts into the SHARED-EXCHANGE plan (r12 verdict #2's
    sibling, the 80x-rung finding): when the uniqueness key's first
    column and the referential key are the SAME column, the default
    plan pays for that column twice — count_distinct shuffles every
    distinct key tuple (zero map-side compression on a primary key:
    measured 32s of a 55s suite at the 80x rung) and the anti-join
    shuffles the full key column again (18s). With key_col set, the
    suite repartitions (key, rest...) ONCE; the pair-dedup, the
    per-key rollup, and the anti-join's left side all consume that one
    exchange with no further lineitem-sized shuffle (HashPartitioning
    on key satisfies every downstream ClusteredDistribution, and
    ReuseExchange/AQE stage reuse dedups the shared subtree across the
    report's branches). The CASE sums stay on a shuffle-free scan
    branch. Identical output (re-gated); requires
    unique_cols[0] == key_col == reference key when both are given."""
    if key_col is not None:
        return _expectation_report_keyed(
            df, checks, unique_cols, reference, key_col
        )
    aggs = [F.count(F.lit(1)).alias("_n")]
    names = []
    for name, cond in checks:
        names.append(name)
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(
                f"_v{len(names) - 1}"
            )
        )
    if unique_cols:
        names.append("uniqueness_" + "_".join(unique_cols))
        # rows with a NULL in any key column are excluded from BOTH
        # counts (a null key can't collide; Spark's multi-column
        # count_distinct drops null-bearing tuples, DuckDB's row-value
        # distinct does NOT — restricting both sides to fully-non-null
        # rows pins one semantics across engines)
        nonnull = None
        for c in unique_cols:
            cnn = F.col(c).isNotNull()
            nonnull = cnn if nonnull is None else (nonnull & cnn)
        aggs.append(
            (
                F.sum(F.when(nonnull, 1).otherwise(0))
                - F.count_distinct(*[F.col(c) for c in unique_cols])
            ).cast("long").alias(f"_v{len(names) - 1}")
        )
    wide = df.agg(*aggs)
    pairs = ", ".join(
        f"'{n}', _v{i}" for i, n in enumerate(names)
    )
    out = wide.selectExpr(
        f"stack({len(names)}, {pairs}) AS (check_name, n_violations)",
        "_n AS n_checked",
    )
    if reference is not None:
        ref_df, lk, rk = reference
        missing = (
            df.join(ref_df, df[lk] == ref_df[rk], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .crossJoin(
                F.broadcast(
                    df.agg(F.count(F.lit(1)).alias("n_checked"))
                )
            )
            .select(
                F.lit(f"referential_{lk}").alias("check_name"),
                "n_violations",
                "n_checked",
            )
        )
        out = out.unionByName(missing)
    return out.select(
        "check_name",
        "n_checked",
        "n_violations",
        F.when(F.col("n_violations") == 0, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    )


def _expectation_report_keyed(
    df: DataFrame,
    checks: list[tuple],
    unique_cols: list[str] | None,
    reference: tuple | None,
    key_col: str,
) -> DataFrame:
    """The shared-exchange spelling — see expectation_report. Output
    rows, names, and exact counters match the default plan; only the
    physical shape differs (one key-column exchange instead of a
    distinct-tuple shuffle plus a second full anti-join shuffle)."""
    if unique_cols and unique_cols[0] != key_col:
        raise ValueError(
            f"key_col {key_col!r} must lead unique_cols {unique_cols!r}"
        )
    if reference is not None and reference[1] != key_col:
        raise ValueError(
            f"key_col {key_col!r} must equal the referential key "
            f"{reference[1]!r}"
        )

    # branch A: the CASE sums + count, shuffle-free (partial agg to one
    # row per scan task)
    names = []
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in checks:
        names.append(name)
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(
                f"_v{len(names) - 1}"
            )
        )
    wide = df.agg(*aggs)

    # branch B: ONE exchange of the key tuple columns; everything below
    # is partition-local on key_col. The per-key rollup `g` must have
    # exactly ONE consumer: with two (a uniqueness agg + a referential
    # anti-join), PushDownLeftSemiAntiJoin rewrites the join branch
    # below the repartition, the two branches' exchange subtrees stop
    # being identical, and ReuseExchange pays the pairs shuffle twice
    # (observed in the executed plan). So the referential check is a
    # LEFT OUTER join (never pushed below an aggregate) folded into the
    # same final scalar aggregate as uniqueness.
    rest = (unique_cols or [key_col])[1:]
    key = F.col(key_col)
    pairs = df.select(key_col, *rest).repartition(key)
    pg = pairs.groupBy(key_col, *rest).agg(
        F.count(F.lit(1)).alias("_c")
    )
    nonnull = key.isNotNull()
    for c in rest:
        nonnull = nonnull & F.col(c).isNotNull()
    g = pg.groupBy(key_col).agg(
        F.sum("_c").alias("_gn"),
        F.sum(F.when(nonnull, F.col("_c")).otherwise(0)).alias("_unn"),
        F.sum(F.when(nonnull, 1).otherwise(0)).alias("_und"),
    )

    scalar_aggs = []
    if unique_cols:
        names.append("uniqueness_" + "_".join(unique_cols))
        scalar_aggs.append(
            (F.sum("_unn") - F.sum("_und"))
            .cast("long")
            .alias(f"_v{len(names) - 1}")
        )
    ref_name = None
    if reference is not None:
        ref_df, lk, rk = reference
        ref_name = f"referential_{lk}"
        names.append(ref_name)
        # outer-join match flag; ref keys deduped so a non-unique
        # reference key can't multiply g's counts (anti-join parity)
        g = g.join(
            ref_df.select(rk).distinct(),
            g[key_col] == F.col(rk),
            "left",
        )
        scalar_aggs.append(
            F.coalesce(
                F.sum(F.when(F.col(rk).isNull(), F.col("_gn"))), F.lit(0)
            )
            .cast("long")
            .alias(f"_v{len(names) - 1}")
        )
    if scalar_aggs:
        wide = wide.crossJoin(F.broadcast(g.agg(*scalar_aggs)))

    out = wide.selectExpr(
        "stack({}, {}) AS (check_name, n_violations)".format(
            len(names),
            ", ".join(f"'{n}', _v{i}" for i, n in enumerate(names)),
        ),
        "_n AS n_checked",
    )
    return out.select(
        "check_name",
        "n_checked",
        "n_violations",
        F.when(F.col("n_violations") == 0, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    )


def chisq_drift(
    sample: DataFrame,
    baseline: DataFrame,
    group_col: str = "source",
    bucket_col: str = "bucket",
    count_col: str = "o",
    out: str = "chisq_micro",
) -> DataFrame:
    """Per-group two-sample chi-square between a SAMPLE histogram and
    a BASELINE histogram — the drift statistic behind
    agg_chisq_drift_by_source, factored over two frames so the
    streaming monitor (fire vs accumulated corpus) and the batch row
    (source vs rest) share one derivation.

    Inputs are (group, bucket, count) histograms; either side may miss
    buckets the other has (outer-join, absent = 0). For each group:
    chi2 = sum_b (o_b*R - r_b*S)^2 / (S * R * (o_b + r_b)), S/R the
    group's sample/baseline totals. Groups present on only ONE side
    are emitted with NULL (no comparison exists — the caller decides
    whether absence is an alert).

    Float discipline: every per-bucket term is one fixed double
    expression over exact BIGINT counts, quantized to integer micros
    BEFORE the only sum — aggregation order cannot leak into the
    result (the agg_chisq_drift_by_source rule). Cost: histograms are
    |groups| x |buckets| rows — broadcast-scale by construction."""
    s = sample.select(
        F.col(group_col).alias("_g"),
        F.col(bucket_col).alias("_b"),
        F.col(count_col).cast("long").alias("_o"),
    )
    b = baseline.select(
        F.col(group_col).alias("_g"),
        F.col(bucket_col).alias("_b"),
        F.col(count_col).cast("long").alias("_r"),
    )
    j = s.join(b, ["_g", "_b"], "full_outer").select(
        "_g",
        "_b",
        F.coalesce("_o", F.lit(0)).alias("_o"),
        F.coalesce("_r", F.lit(0)).alias("_r"),
    )
    tot = j.groupBy("_g").agg(
        F.sum("_o").cast("long").alias("_s"),
        F.sum("_r").cast("long").alias("_rt"),
    )
    terms = j.join(tot, "_g").select(
        "_g",
        F.expr(
            "CASE WHEN _s = 0 OR _rt = 0 THEN NULL"
            " ELSE CAST(round("
            " CAST(_o * _rt - _r * _s AS DOUBLE)"
            " * CAST(_o * _rt - _r * _s AS DOUBLE)"
            " / (CAST(_s AS DOUBLE) * CAST(_rt AS DOUBLE)"
            "    * CAST(_o + _r AS DOUBLE))"
            " * 1000000) AS BIGINT) END"
        ).alias("_t"),
    )
    return terms.groupBy("_g").agg(
        F.sum("_t").cast("long").alias(out)
    ).select(F.col("_g").alias(group_col), out)
