"""File-history ledger — the dedup/result-cache table (F2 write side).

Reference: FileHistory rows keyed by content hash + path, status-gated
replay of cached results (workflow_v2/models/file_history.py:14-54;
replay destination.py:593-612).

Storage here is plain parquet with an atomic directory swap, because
this container has no Delta/Iceberg. The upsert contract is the same
as a Delta `MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`
keyed on (cache_key, workflow_id, file_path) — at cluster scale swap
this module's `merge` for a real Delta MERGE and everything upstream
is unchanged (the API only promises upsert semantics).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unstract_spark.schemas import FILE_HISTORY
from unstract_spark.sinks.ledger_lock import LedgerLock

MERGE_KEYS = ["cache_key", "workflow_id", "file_path"]


class FileHistoryStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        """Snapshot read: localCheckpoint pins the contents so a
        subsequent merge()'s directory swap can't invalidate open
        lineages (Delta gives this via snapshot isolation; the parquet
        substitute must materialize)."""
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], FILE_HISTORY)
        return self.spark.read.parquet(self.path).localCheckpoint(eager=True)

    def merge(self, updates: DataFrame) -> None:
        """Upsert: newest row per merge key wins.

        union + window-dedup implements MERGE semantics; the write goes
        to a staging dir then swaps atomically so concurrent readers
        never see a half-written ledger. The whole read-modify-swap is
        serialized under LedgerLock so two concurrent writers cannot
        base their merge on the same snapshot and drop each other's
        rows (the reference gets this from Postgres transactions;
        Delta's optimistic commit replaces the lock at cluster scale).
        """
        updates = updates.withColumn("_ts", F.lit(time.time()))
        with LedgerLock(self.path):
            current = self.read().withColumn("_ts", F.lit(0.0))
            merged = current.unionByName(updates, allowMissingColumns=True)
            w = Window.partitionBy(*MERGE_KEYS).orderBy(F.col("_ts").desc())
            deduped = (
                merged.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_ts")
            )
            staging = f"{self.path}.staging-{int(time.time() * 1000)}"
            deduped.write.mode("overwrite").parquet(staging)
            old = f"{self.path}.old-{int(time.time() * 1000)}"
            if os.path.exists(self.path):
                os.rename(self.path, old)
            os.rename(staging, self.path)
            if os.path.exists(old):
                shutil.rmtree(old, ignore_errors=True)

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
