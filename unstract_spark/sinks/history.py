"""File-history ledger — the dedup/result-cache table (F2 write side).

Reference: FileHistory rows keyed by content hash + path, status-gated
replay of cached results (workflow_v2/models/file_history.py:14-54;
replay destination.py:593-612).

Two storage backends behind one upsert-only API (the contract is a
Delta `MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT` keyed on
(cache_key, workflow_id, file_path)):

- `backend="swap"` (default): plain parquet + atomic directory swap,
  writers serialized by LedgerLock — single-node/NFS honest.
- `backend="manifest"`: the transactional log of sinks/manifest.py —
  lock-FREE optimistic commits (put-if-absent manifest files, Delta's
  own protocol), snapshot-isolated readers, crash-orphans invisible.
  This is the cluster story; LedgerLock is not used on this path.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unstract_spark.schemas import FILE_HISTORY
from unstract_spark.sinks.ledger_lock import LedgerLock
from unstract_spark.sinks.manifest import ManifestTable

MERGE_KEYS = ["cache_key", "workflow_id", "file_path"]


def _merge_newest_wins(current: DataFrame, updates: DataFrame) -> DataFrame:
    """MERGE semantics shared by both backends: union + per-key window
    dedup, updates outranking the current snapshot."""
    cur = current.withColumn("_ts", F.lit(0.0))
    upd = updates.withColumn("_ts", F.lit(1.0))
    merged = cur.unionByName(upd, allowMissingColumns=True)
    w = Window.partitionBy(*MERGE_KEYS).orderBy(F.col("_ts").desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_ts")
    )


class FileHistoryStore:
    def __init__(self, spark: SparkSession, path: str, backend="swap"):
        """`backend`: "swap", "manifest" (POSIX put-if-absent), or a
        `manifest.CommitBackend` instance (manifest protocol over a
        pluggable commit log — e.g. an object store's conditional
        PUT)."""
        from unstract_spark.sinks.manifest import CommitBackend

        self.spark = spark
        self.path = path
        if isinstance(backend, CommitBackend):
            self._manifest = ManifestTable(spark, path, commit_backend=backend)
        elif backend == "manifest":
            self._manifest = ManifestTable(spark, path)
        elif backend == "swap":
            self._manifest = None
        else:
            raise ValueError(f"unknown ledger backend {backend!r}")

    def read(self) -> DataFrame:
        """Snapshot read. Swap backend: localCheckpoint pins the
        contents so a subsequent merge()'s directory swap can't
        invalidate open lineages. Manifest backend: segments are
        immutable, so the snapshot is stable with no materialization;
        upserts resolve here by newest-wins dedup-on-read over the
        segment commit order (the LSM read path; compact() folds the
        window cost back down)."""
        if self._manifest is not None:
            _, df = self._manifest.snapshot_with_seq(FILE_HISTORY)
            w = Window.partitionBy(*MERGE_KEYS).orderBy(F.col("_seq").desc())
            return (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_seq")
            )
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], FILE_HISTORY)
        return self.spark.read.parquet(self.path).localCheckpoint(eager=True)

    def merge(self, updates: DataFrame) -> None:
        """Upsert: newest row per merge key wins.

        Swap backend: read-modify-swap under LedgerLock (two unlocked
        writers would base on the same snapshot and drop each other's
        rows) — O(table) per merge. Manifest backend: lock-free
        transactional APPEND of just the update segment — O(updates)
        per merge, the only write cost a 100 TB ledger can afford for
        a 200-row batch; precedence is resolved at read time. A batch
        with internal duplicate keys keeps an arbitrary one — the same
        contract the swap path's single-timestamp window gives.
        """
        if self._manifest is not None:
            self._manifest.append(updates)
            return
        with LedgerLock(self.path):
            deduped = _merge_newest_wins(self.read(), updates)
            staging = f"{self.path}.staging-{int(time.time() * 1000)}"
            deduped.write.mode("overwrite").parquet(staging)
            old = f"{self.path}.old-{int(time.time() * 1000)}"
            if os.path.exists(self.path):
                os.rename(self.path, old)
            os.rename(staging, self.path)
            if os.path.exists(old):
                shutil.rmtree(old, ignore_errors=True)

    def compact(self) -> bool:
        """Manifest backend maintenance: fold all segments into one
        (the resolved newest-wins view), bounding the read window and
        vacuum-able garbage. No-op on the swap backend (always one
        'segment'). Returns True if the compaction committed; False
        means a concurrent append won the version — the appended rows
        are preserved and compaction should simply be retried later.

        The vacuum after a successful commit is safe for concurrent
        readers regardless of segment age: try_commit stamps superseded
        segments with the supersession time, so min_age_s measures time
        since DEREFERENCE, not since the segment was written."""
        if self._manifest is None:
            return True
        v, df = self._manifest.snapshot_with_seq(FILE_HISTORY)
        w = Window.partitionBy(*MERGE_KEYS).orderBy(F.col("_seq").desc())
        resolved = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_seq")
        )
        ok = self._manifest.compact(resolved, base_version=v)
        if ok:
            self._manifest.vacuum()
        return ok

    def completed(self) -> DataFrame:
        """Rows eligible for dedup/replay (status gate, file_history.py:21)."""
        return self.read().filter(F.col("status") == "COMPLETED")

    def dedup_catalog(self, files: DataFrame) -> DataFrame:
        """F2: drop catalog rows already COMPLETED (left_anti)."""
        hist = self.completed().select(
            F.col("cache_key").alias("file_hash"), "file_path"
        )
        return files.join(hist, ["file_hash", "file_path"], "left_anti")

    def replay_results(self, files: DataFrame) -> DataFrame:
        """Cached results for catalog rows that hit history (the replay
        path, destination.py:593-612): inner join on hash+path."""
        hist = self.completed().select(
            F.col("cache_key").alias("file_hash"), "file_path", "result", "metadata"
        )
        return files.join(hist, ["file_hash", "file_path"], "inner")
