"""D6 — webhook/notification sink via an outbox table.

Reference: execution-complete payloads POSTed to webhook/Slack
providers with retries (workers/notification/tasks.py:29-103; enqueue
workers/callback/tasks.py:576-644).

Spark-first: executors never make user-facing HTTP calls mid-job.
Completions append to an *outbox* table (exactly-once rows, written
with the job); a small driver-side notifier drains the outbox with
bounded retries and marks rows sent. HTTP is stubbed behind a
transport callable — tests inject one; production wires requests/
urllib. This split keeps delivery at-least-once with dedup on
notification_id rather than losing sends to task retries.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unstract_spark.sinks.ledger_lock import LedgerLock

OUTBOX_SCHEMA = (
    "notification_id string, execution_id string, url string, payload string,"
    " status string, attempts int, created_at timestamp"
)


def enqueue_notifications(
    results: DataFrame, url: str, execution_id: str
) -> DataFrame:
    """Shape completion rows as outbox entries (one per execution here;
    per-file granularity is a groupBy away)."""
    agg = results.groupBy().agg(
        F.count(F.lit(1)).alias("n_files"),
    )
    return agg.select(
        F.expr("uuid()").alias("notification_id"),
        F.lit(execution_id).alias("execution_id"),
        F.lit(url).alias("url"),
        F.to_json(F.struct(F.lit(execution_id).alias("execution_id"), "n_files")).alias(
            "payload"
        ),
        F.lit("PENDING").alias("status"),
        F.lit(0).alias("attempts"),
        F.current_timestamp().alias("created_at"),
    )


def append_outbox(rows: DataFrame, path: str) -> None:
    with LedgerLock(path):
        rows.write.mode("append").parquet(path)


def drain_outbox(
    spark: SparkSession,
    path: str,
    transport: Callable[[str, str], bool],
    max_retries: int = 5,
    backoff_s: float = 0.05,
    max_attempts: int = 15,
) -> dict[str, int]:
    """Driver-side delivery loop: POST pending rows, mark
    SENT / PENDING / FAILED with persistent attempt accounting.

    The outbox is small (one row per execution), so collecting it to
    the driver is correct — delivery is inherently serial per endpoint
    and needs retry state.

    Every transport call counts as one attempt and the count PERSISTS
    across drains (reference: workers/notification/tasks.py:29-103 —
    Celery task retries with max_retries then gives up). A drain gives
    each pending row up to `max_retries` calls with exponential
    backoff; rows still failing stay PENDING with their incremented
    `attempts`, and once lifetime attempts reach `max_attempts` the row
    flips to terminal FAILED — it is never re-delivered. Returns
    {"sent", "failed", "pending"} counters for this drain.
    """
    pending = (
        spark.read.schema(OUTBOX_SCHEMA).parquet(path).filter(F.col("status") == "PENDING")
    ).collect()
    sent = failed = still_pending = 0
    updates: dict[str, tuple[str, int]] = {}  # id -> (status, attempts)
    for row in pending:
        attempts = row.attempts or 0
        ok = False
        calls = 0
        while calls < max_retries and attempts + calls < max_attempts:
            try:
                ok = bool(transport(row.url, row.payload))
            except Exception:  # noqa: BLE001 — transport errors retry
                ok = False
            calls += 1
            if ok:
                break
            time.sleep(backoff_s * (3 ** (calls - 1)))
        new_attempts = attempts + calls
        if ok:
            status = "SENT"
            sent += 1
        elif new_attempts >= max_attempts:
            status = "FAILED"  # terminal: no re-delivery on later drains
            failed += 1
        else:
            status = "PENDING"
            still_pending += 1
        updates[row.notification_id] = (status, new_attempts)
    if updates:
        rows = [(k, v[0], v[1]) for k, v in updates.items()]
        upd = spark.createDataFrame(
            rows, "notification_id string, _new_status string, _new_attempts int"
        )
        with LedgerLock(path):
            rewritten = (
                spark.read.schema(OUTBOX_SCHEMA)
                .parquet(path)
                .join(F.broadcast(upd), "notification_id", "left")
                .select(
                    "notification_id",
                    "execution_id",
                    "url",
                    "payload",
                    F.coalesce("_new_status", "status").alias("status"),
                    F.coalesce("_new_attempts", "attempts").alias("attempts"),
                    "created_at",
                )
            )
            staging = f"{path}.staging-{int(time.time() * 1000)}"
            rewritten.write.mode("overwrite").parquet(staging)
            import os
            import shutil

            old = f"{path}.old-{int(time.time() * 1000)}"
            os.rename(path, old)
            os.rename(staging, path)
            shutil.rmtree(old, ignore_errors=True)
    return {"sent": sent, "failed": failed, "pending": still_pending}
