"""Persisted TABLE STATISTICS store — the ANALYZE TABLE side of the
sketch family.

A planner choosing broadcast-vs-shuffle-vs-salt needs row counts and
key cardinalities BEFORE running the query; recomputing them per query
wastes the very scans the statistics exist to avoid. This store
persists, per (table, column): the row/non-null counts and the KMV
distinct-count sketch (operators/sketches.py — k longs, mergeable,
deterministic), and answers planning questions from disk:

- distinct_estimate(table, column) — the KMV estimator over the
  stored sketch (exact when the column had < k distinct values).
- join_estimate(tA, cA, tB, cB) — the textbook containment estimate
  |A ⋈ B| ≈ nA·nB / max(ndvA, ndvB) (Selinger '79's formula, still
  what cost-based optimizers default to), computed from stored stats
  only — no data scan at planning time. When the two key sets overlap
  the stored SKETCHES can refine the ndv denominators via kmv_overlap,
  but the store deliberately keeps the no-scan formula: its inputs
  are auditable numbers a DBA can read.
- broadcast_advice(table, threshold_bytes) — n_rows·avg_row_bytes vs
  the autoBroadcastJoinThreshold-style knob.

Layout: <path>/sketch/table=<t>/column=<c>/*.parquet (the h rows) and
<path>/meta/table=<t>/column=<c>/*.parquet (one row: n_rows,
n_nonnull, n_sketch, kth_hash, k, avg_len). analyze() is one scan per
column (ANALYZE is offline/maintenance work — the scans it spends are
the ones every future planning decision saves); per-shard sketches
from different analyze() runs of table PARTITIONS could be kmv_merge'd,
but the store keeps whole-table analyze for auditability.

Reference anchor: the reference platform has no optimizer surface (its
joins are fixed-shape file-pipeline anti-joins); this is part of the
beyond-reference scale toolkit, alongside kmv_join_size (which scans
data for a sharper sampled-key estimate when a scan is affordable).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from unstract_spark.operators import sketches


class TableStatsStore:
    """Parquet-backed per-(table, column) statistics with KMV
    distinct sketches. All numbers deterministic (md5-driven), so two
    analyze() runs of the same data produce byte-identical stats."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _dir(self, kind: str, table: str, column: str) -> str:
        return os.path.join(
            self.path, kind, f"table={table}", f"column={column}"
        )

    def analyze(
        self, df: DataFrame, table: str, columns: list[str], k: int = 256
    ) -> None:
        """Compute and persist stats for `columns` (one scan each)."""
        for c in columns:
            col = F.col(c)
            sk = sketches.kmv_sketch(
                df.select(col.cast("string").alias("_s")), "_s", k
            )
            sk.write.mode("overwrite").parquet(self._dir("sketch", table, c))
            sk_back = self.spark.read.parquet(self._dir("sketch", table, c))
            meta = df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(col).alias("n_nonnull"),
                F.sum(
                    F.length(col.cast("string")).cast("decimal(18,6)")
                ).alias("_len_sum"),
            ).crossJoin(
                F.broadcast(
                    sk_back.agg(
                        F.count(F.lit(1)).alias("n_sketch"),
                        F.max("h").alias("kth_hash"),
                    )
                )
            ).select(
                "n_rows",
                "n_nonnull",
                "n_sketch",
                "kth_hash",
                F.lit(k).cast("long").alias("k"),
                F.when(F.col("n_nonnull") == 0, F.lit(None).cast("double"))
                .otherwise(
                    F.col("_len_sum").cast("double") / F.col("n_nonnull")
                )
                .alias("avg_len"),
            )
            meta.coalesce(1).write.mode("overwrite").parquet(
                self._dir("meta", table, c)
            )

    def _meta(self, table: str, column: str):
        rows = self.spark.read.parquet(
            self._dir("meta", table, column)
        ).collect()
        if len(rows) != 1:
            raise ValueError(
                f"stats for {table}.{column}: expected 1 meta row, "
                f"got {len(rows)} — re-run analyze()"
            )
        return rows[0]

    def distinct_estimate(self, table: str, column: str) -> float:
        """NDV from the stored sketch (exact below k)."""
        m = self._meta(table, column)
        if m.n_sketch < m.k:
            return float(m.n_sketch)
        return float(m.k - 1) * sketches.KMV_M / float(m.kth_hash)

    def join_estimate(
        self, table_a: str, col_a: str, table_b: str, col_b: str
    ) -> float:
        """Containment join-size estimate nA·nB / max(ndvA, ndvB) from
        stored stats only (no scan). Upper-bounds the truth when the
        key sets only partially overlap; kmv_join_size is the
        data-scanning refinement when a scan is affordable."""
        ma, mb = self._meta(table_a, col_a), self._meta(table_b, col_b)
        ndv = max(
            self.distinct_estimate(table_a, col_a),
            self.distinct_estimate(table_b, col_b),
        )
        if ndv == 0:
            return 0.0
        return float(ma.n_nonnull) * float(mb.n_nonnull) / ndv

    def broadcast_advice(
        self, table: str, column: str, threshold_bytes: int = 64 << 20
    ) -> bool:
        """True when the analyzed column's table plausibly fits under
        the broadcast threshold (n_rows · mean rendered length of this
        column is a LOWER bound on row bytes — a True here still
        means 'check the full row width', a False is decisive)."""
        m = self._meta(table, column)
        if m.avg_len is None:
            return True
        return float(m.n_rows) * float(m.avg_len) <= threshold_bytes
