"""Custom stateful streaming operator — execution progress tracking.

The reference tracks per-execution file progress in Django rows updated
by Celery workers (batch status rollup A2, workflow_manager execution
models). As a stream, that is a CUSTOM stateful operator — not
expressible with built-in windowed aggregation because completion is a
*condition over accumulated state* (completed + error >= total), not a
time window. `applyInPandasWithState` is Spark's escape hatch for
exactly this: per-key state in the checkpoint, Arrow-batched updates,
processing-time timeouts for abandoned keys.

State per execution_id: (files_seen, completed, error, total_files).
Each micro-batch emits the execution's current rollup; the state is
dropped the moment the execution finishes (bounded state — finished
executions cost nothing) or when the timeout lapses (abandoned
executions are flushed as timed_out instead of leaking state forever).
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
STATE_SCHEMA = "files_seen long, completed long, error long, total_files long"


def execution_progress_stream(
    events: DataFrame,
    timeout_s: int = 3600,
) -> DataFrame:
    """events(execution_id, status, total_files, ...) -> rollup stream.

    status vocabulary is the pipeline's SUCCESS/ERROR; total_files is
    stamped on every event by the enqueuing side (the reference stores
    it on the execution row). Emits one updated rollup row per
    execution per micro-batch; `done` flips when every file reached a
    terminal status, `timed_out` when the state aged out instead.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (execution_id,) = key
        if state.hasTimedOut:
            seen, comp, err, tot = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "execution_id": execution_id,
                        "files_seen": seen,
                        "completed": comp,
                        "error": err,
                        "total_files": tot,
                        "done": False,
                        "timed_out": True,
                    }
                ]
            )
            return
        seen = comp = err = tot = 0
        if state.exists:
            seen, comp, err, tot = state.get
        for pdf in pdfs:
            seen += len(pdf)
            comp += int((pdf["status"] == "SUCCESS").sum())
            err += int((pdf["status"] == "ERROR").sum())
            if len(pdf):
                tot = max(tot, int(pdf["total_files"].max()))
        done = tot > 0 and comp + err >= tot
        if done:
            state.remove()  # finished executions hold no state
        else:
            state.update((seen, comp, err, tot))
            state.setTimeoutDuration(timeout_s * 1000)
        yield pd.DataFrame(
            [
                {
                    "execution_id": execution_id,
                    "files_seen": seen,
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
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_progress_drain(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    batch_fn,
    timeout_s: int = 3600,
) -> None:
    """AvailableNow drain of a parquet event feed through the stateful
    rollup — state survives across fires via the checkpoint, matching
    the incremental pipelines in streaming/incremental.py."""
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
    q.awaitTermination()
