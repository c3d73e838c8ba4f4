"""D4 — human-in-the-loop review-queue sink + F6/F7 routing predicates.

Reference: percentage sampling picks files for manual review
(plugins/workflow_v2/utils.py:28-43 `_mrq_files`), rule predicates over
the extraction result decide routing (destination.py:172-260), and
QueueResult rows (with base64 content and a 90-day TTL) land in
review_queue_{org}_{workflow} (destination.py:853-1115).

Spark-first: routing is a boolean column (deterministic hash-sample OR
rule predicate), the queue is an append table with `expires_at`;
consumers filter unexpired rows; a cleanup job drops expired ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unstract_spark.schemas import DEFAULT_HITL_TTL_SECONDS


def sample_predicate(key: Column, pct: float) -> Column:
    """Deterministic ~pct% sample by key hash (seeded, replayable).

    The reference uses random.sample with a floor of 1; a hash-mod
    sample keeps retries/replays routing the same files. pct>=100
    routes everything, pct<=0 nothing.
    """
    if pct <= 0:
        return F.lit(False)
    if pct >= 100:
        return F.lit(True)
    bucket = F.pmod(F.abs(F.hash(key)), F.lit(10_000))
    return bucket < int(pct * 100)


def rule_predicate(rules: list[tuple[str, str]]) -> Column:
    """F7: configured rules -> one boolean Column.

    Each rule is (combinator, sql_expr) with combinator AND/OR applied
    left-to-right, like the reference's rule engine over result fields.
    """
    if not rules:
        return F.lit(False)
    acc: Column | None = None
    for comb, expr in rules:
        c = F.expr(expr)
        if acc is None:
            acc = c
        elif comb.upper() == "AND":
            acc = acc & c
        else:
            acc = acc | c
    return acc


def route_to_review(
    results: DataFrame,
    queue_name: str,
    pct: float = 0.0,
    rules: list[tuple[str, str]] | None = None,
    sample_key: str = "file_hash",
    ttl_seconds: int = DEFAULT_HITL_TTL_SECONDS,
) -> DataFrame:
    """Select rows needing review and shape them as queue entries."""
    pred = sample_predicate(F.col(sample_key), pct) | rule_predicate(rules or [])
    routed = results.filter(pred)
    return routed.select(
        F.lit(queue_name).alias("queue_name"),
        F.col("file_name").alias("file") if "file_name" in results.columns
        else F.col(sample_key).alias("file"),
        F.coalesce(
            F.col("status") if "status" in results.columns else F.lit(None), F.lit("success")
        ).alias("status"),
        F.to_json(F.struct(*[c for c in results.columns])).alias("result"),
        (
            F.base64(F.col("content"))
            if "content" in results.columns
            else F.lit(None).cast("string")
        ).alias("file_content_b64"),
        F.lit(None).cast("string").alias("whisper_hash"),
        (
            F.col("extracted_text")
            if "extracted_text" in results.columns
            else F.lit(None).cast("string")
        ).alias("extracted_text"),
        F.lit(None).cast("string").alias("file_execution_id"),
        F.lit(None).cast("string").alias("execution_id"),
        F.current_timestamp().alias("enqueued_at"),
        F.lit(ttl_seconds).cast("long").alias("ttl_seconds"),
    )


def write_queue(queue_rows: DataFrame, path: str) -> None:
    """Append to the review table, partitioned by queue for consumer
    pruning (a consumer reads only its queue's partition)."""
    queue_rows.write.mode("append").partitionBy("queue_name").parquet(path)


def read_unexpired(spark, path: str) -> DataFrame:
    """Consumer view: TTL filter (expiry = enqueue + ttl)."""
    df = spark.read.parquet(path)
    expiry = F.col("enqueued_at") + F.make_dt_interval(secs=F.col("ttl_seconds"))
    return df.filter(expiry > F.current_timestamp())
