"""Custom stateful streaming operator — execution progress tracking.

The reference tracks per-execution file progress in Django rows updated
by Celery workers (batch status rollup A2, workflow_manager execution
models). As a stream, that is a CUSTOM stateful operator — not
expressible with built-in windowed aggregation because completion is a
*condition over accumulated state* (completed + error >= total), not a
time window. `applyInPandasWithState` is Spark's escape hatch for
exactly this: per-key state in the checkpoint, Arrow-batched updates.

State per execution_id: terminal-status bookkeeping keyed by an 8-byte
hash prefix of file_hash (a retried/duplicated terminal event for the
same file never double-counts — first terminal status wins), the max
non-null total_files seen, and a last-update timestamp. The prefix
arrays are `array<long>` — 8 bytes per file instead of a 64-hex string
(old design), so a 1M-file execution holds ~16 MB of state, not
~128 MB, and nothing is re-sorted per batch. The state bound is still
O(files per execution); executions beyond that scale should pre-dedup
terminal events upstream with
`dropDuplicatesWithinWatermark("execution_id", "file_hash")` and run
counter-only state. Prefix collisions (birthday bound ~n^2/2^65) are
negligible at any realistic per-execution file count.

Liveness: the operator registers NO processing-time timeout.
`Trigger.AvailableNow` + `ProcessingTimeTimeout` is a liveness trap —
the query busy-loops empty micro-batches waiting for live timeouts to
fire instead of stopping after the drain. Abandoned executions are
instead aged out lazily: state carries `last_update_ms`, and when a key
next receives data after more than `timeout_s` of silence, the stale
accumulation is flushed as a `timed_out=True` row and counting
restarts. Keys that never receive data again hold a bounded handful of
longs and two prefix arrays in the checkpoint, and `sweep_stale_state`
below exposes the same age-out as a batch pass over emitted rollups
(each carries `updated_at_ms`) for operators that need eager reaping.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "execution_id string, files_seen long, completed long, error long,"
    " total_files long, done boolean, timed_out boolean, updated_at_ms long"
)
STATE_SCHEMA = (
    "completed long, error long, total_files long, last_update_ms long,"
    " seen_prefixes array<long>, terminal_prefixes array<long>"
)

_TERMINAL = ("SUCCESS", "ERROR")


def _hash_prefix(value) -> int:
    """Signed 8-byte prefix of sha256(file_hash) — the compact set
    member the state arrays store."""
    return struct.unpack(">q", hashlib.sha256(str(value).encode()).digest()[:8])[0]


def execution_progress_stream(
    events: DataFrame,
    timeout_s: int = 3600,
) -> DataFrame:
    """events(execution_id, file_hash, status, total_files) -> rollups.

    status vocabulary is the pipeline's SUCCESS/ERROR; total_files is
    stamped on every event by the enqueuing side (the reference stores
    it on the execution row). Emits one updated rollup row per
    execution per micro-batch; `done` flips when every file reached a
    terminal status, `timed_out` rows flush accumulations that sat
    silent for longer than `timeout_s` before new data arrived.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (execution_id,) = key
        comp = err = tot = 0
        seen: set[int] = set()
        term: set[int] = set()
        now_ms = state.getCurrentProcessingTimeMs()
        if state.exists:
            comp, err, tot, last_ms, seen_list, term_list = state.get
            if timeout_s and now_ms - last_ms > timeout_s * 1000:
                # Stale accumulation: flush as timed_out, restart.
                yield pd.DataFrame(
                    [
                        {
                            "execution_id": execution_id,
                            "files_seen": len(seen_list),
                            "completed": comp,
                            "error": err,
                            "total_files": tot,
                            "done": False,
                            "timed_out": True,
                            "updated_at_ms": now_ms,
                        }
                    ]
                )
                comp = err = tot = 0
            else:
                seen, term = set(seen_list), set(term_list)
        for pdf in pdfs:
            hashes = pdf["file_hash"].dropna()
            seen.update(hashes.map(_hash_prefix))
            fresh = pdf[
                pdf["status"].isin(_TERMINAL) & pdf["file_hash"].notna()
            ].copy()
            fresh["_hp"] = fresh["file_hash"].map(_hash_prefix)
            fresh = fresh.drop_duplicates("_hp", keep="first")
            fresh = fresh[~fresh["_hp"].isin(term)]
            comp += int((fresh["status"] == "SUCCESS").sum())
            err += int((fresh["status"] == "ERROR").sum())
            term.update(fresh["_hp"])
            tf = pdf["total_files"].dropna()
            if len(tf):
                tot = max(tot, int(tf.max()))
        done = tot > 0 and comp + err >= tot
        if done:
            state.remove()  # finished executions hold no state
        else:
            # plain list round-trip: set-membership semantics don't need
            # an order, and sorting per batch was O(n log n) every fire
            state.update((comp, err, tot, now_ms, list(seen), list(term)))
        yield pd.DataFrame(
            [
                {
                    "execution_id": execution_id,
                    "files_seen": len(seen),
                    "completed": comp,
                    "error": err,
                    "total_files": tot,
                    "done": done,
                    "timed_out": False,
                    "updated_at_ms": now_ms,
                }
            ]
        )

    return events.groupBy("execution_id").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def sweep_stale_state(
    rollups: DataFrame, timeout_s: int = 3600, now_ms: int | None = None
) -> DataFrame:
    """Eager age-out as a batch pass over EMITTED rollups.

    The lazy in-stream age-out only fires when a key receives new data;
    executions that go permanently silent are surfaced here instead:
    take each execution's latest rollup (max updated_at_ms), keep the
    ones that are not done and have been silent for more than
    `timeout_s`, and return them flagged `timed_out=True` — callers
    append these to the same sink their foreachBatch writes, and can
    then drop the checkpoint key's history at rest. `now_ms` pins the
    clock for deterministic tests (defaults to the wall clock).
    """
    now = F.lit(now_ms) if now_ms is not None else F.unix_millis(F.current_timestamp())
    w = Window.partitionBy("execution_id").orderBy(F.col("updated_at_ms").desc())
    latest = (
        rollups.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(
        (~F.col("done")) & (now - F.col("updated_at_ms") > timeout_s * 1000)
    ).withColumn("timed_out", F.lit(True))


def run_progress_drain(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    batch_fn,
    timeout_s: int = 3600,
    drain_timeout_s: int = 300,
) -> None:
    """AvailableNow drain of a parquet event feed through the stateful
    rollup — state survives across fires via the checkpoint, matching
    the incremental pipelines in streaming/incremental.py. The drain is
    hard-bounded: if `awaitTermination` does not finish within
    `drain_timeout_s` the query is stopped and the stall surfaced."""
    schema = "execution_id string, file_hash string, status string, total_files long"
    stream = spark.readStream.schema(schema).parquet(source_dir)
    rollup = execution_progress_stream(stream, timeout_s=timeout_s)
    q = (
        rollup.writeStream.foreachBatch(batch_fn)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(drain_timeout_s)
        if not finished:
            raise TimeoutError(
                f"progress drain did not finish within {drain_timeout_s}s"
            )
    finally:
        if q.isActive:
            q.stop()
