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

    def join_estimate_refined(
        self, table_a: str, col_a: str, table_b: str, col_b: str
    ) -> float:
        """Overlap-REFINED join-size estimate from the two STORED
        sketches (still no data scan — only the 2k persisted hash
        rows are read): nA·nB·Î / (ndvA·ndvB), where Î is the
        intersection cardinality estimated by the theta-sketch
        overlap of the stored sketches. Under uniform per-key counts
        this is exact in expectation; it repairs the containment
        formula's blind spot — partially overlapping key domains —
        which join_estimate deliberately ignores (its inputs stay
        DBA-readable scalars)."""
        ma, mb = self._meta(table_a, col_a), self._meta(table_b, col_b)
        if ma.k != mb.k:
            raise ValueError(
                f"sketches built with different k ({ma.k} vs {mb.k}) "
                "cannot merge — re-analyze one side"
            )
        ndv_a = self.distinct_estimate(table_a, col_a)
        ndv_b = self.distinct_estimate(table_b, col_b)
        if ndv_a == 0 or ndv_b == 0:
            return 0.0
        sa = self.spark.read.parquet(self._dir("sketch", table_a, col_a))
        sb = self.spark.read.parquet(self._dir("sketch", table_b, col_b))
        st = sketches.overlap_stats_from_sketches(sa, sb, int(ma.k)).collect()[
            0
        ]
        if st.n_merged == 0:
            return 0.0
        if st.n_merged < ma.k:
            est_union = float(st.n_merged)
        else:
            est_union = (
                float(ma.k - 1) * sketches.KMV_M / float(st.kth_hash)
            )
        est_i = float(st.n_both) / float(st.n_merged) * est_union
        return (
            float(ma.n_nonnull) * float(mb.n_nonnull) * est_i
            / (ndv_a * ndv_b)
        )

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
