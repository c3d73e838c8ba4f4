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
