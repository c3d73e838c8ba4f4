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
    rows.write.mode("append").parquet(path)


def drain_outbox(
    spark: SparkSession,
    path: str,
    transport: Callable[[str, str], bool],
    max_retries: int = 5,
    backoff_s: float = 0.05,
) -> dict[str, int]:
    """Driver-side delivery loop: POST pending rows, mark SENT/FAILED.

    The outbox is small (one row per execution), so collecting it to
    the driver is correct — delivery is inherently serial per endpoint
    and needs retry state. Returns counters.
    """
    pending = (
        spark.read.schema(OUTBOX_SCHEMA).parquet(path).filter(F.col("status") == "PENDING")
    ).collect()
    sent = failed = 0
    done_ids = []
    for row in pending:
        ok = False
        for attempt in range(max_retries):
            try:
                if transport(row.url, row.payload):
                    ok = True
                    break
            except Exception:  # noqa: BLE001 — transport errors retry
                pass
            time.sleep(backoff_s * (3**attempt))
        if ok:
            sent += 1
            done_ids.append(row.notification_id)
        else:
            failed += 1
    if done_ids:
        remaining = (
            spark.read.schema(OUTBOX_SCHEMA).parquet(path)
            .withColumn(
                "status",
                F.when(F.col("notification_id").isin(done_ids), "SENT").otherwise(
                    F.col("status")
                ),
            )
        )
        staging = f"{path}.staging-{int(time.time() * 1000)}"
        remaining.write.mode("overwrite").parquet(staging)
        import os
        import shutil

        old = f"{path}.old-{int(time.time() * 1000)}"
        os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old, ignore_errors=True)
    return {"sent": sent, "failed": failed}
