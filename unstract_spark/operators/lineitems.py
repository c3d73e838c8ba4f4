"""line-item / table extraction — the iterative continuation loop.

Reference: `line-item` answers are large JSON arrays that can truncate
at the token limit; extraction resumes where it stopped and the parts
are stitched (prompt_studio models.py:26-33; plugin dispatch
legacy_executor.py:2076-2162).

Spark-first: the continuation loop is a *bounded driver loop* over a
fully distributed state frame — per-document offset/accumulator live
IN the frame, each round is one Arrow-batched pass over only the
still-truncated rows, and the driver touches nothing but a boolean
"anything left?" count. Most documents finish in round 1, so round-2+
frames shrink geometrically. localCheckpoint cuts the per-round
lineage so the plan doesn't grow with rounds (the iterative-algorithm
pattern; same as MLlib's).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mock_lineitem_provider(fingerprint: str, offset: int, page_size: int = 4) -> str:
    """Deterministic mock: each doc has md5-derived 1..10 line items;
    a call returns up to page_size items from `offset` and marks
    truncation — exercising the continuation contract."""
    n_items = (int(hashlib.md5(fingerprint.encode()).hexdigest()[:2], 16) % 10) + 1
    items = [
        {"line_no": i, "sku": hashlib.md5(f"{fingerprint}:{i}".encode()).hexdigest()[:8]}
        for i in range(offset, min(offset + page_size, n_items))
    ]
    return json.dumps({"items": items, "truncated": offset + page_size < n_items})


def extract_line_items(
    docs: DataFrame,
    id_col: str = "doc_id",
    fingerprint_col: str = "fingerprint",
    provider: Callable[[str, int], str] | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """Extract complete line-item arrays with continuation.

    Returns (id, line_items json-array string, n_items, rounds).
    """
    provider = provider or mock_lineitem_provider
    state_schema = (
        f"{id_col} long, {fingerprint_col} string, acc string, offset int,"
        " truncated boolean, rounds int"
    )

    def advance(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            accs, offs, truncs, rounds = [], [], [], []
            for fp, acc, off, rnd in zip(
                pdf[fingerprint_col], pdf["acc"], pdf["offset"], pdf["rounds"]
            ):
                resp = json.loads(provider(fp, int(off)))
                merged = json.loads(acc) + resp["items"]
                accs.append(json.dumps(merged))
                offs.append(int(off) + len(resp["items"]))
                truncs.append(bool(resp["truncated"]))
                rounds.append(int(rnd) + 1)
            out = pdf.copy()
            out["acc"] = accs
            out["offset"] = offs
            out["truncated"] = truncs
            out["rounds"] = rounds
            yield out

    state = docs.select(
        F.col(id_col),
        F.col(fingerprint_col),
        F.lit("[]").alias("acc"),
        F.lit(0).alias("offset"),
        F.lit(True).alias("truncated"),
        F.lit(0).alias("rounds"),
    )
    for _ in range(max_rounds):
        pending = state.filter(F.col("truncated"))
        if pending.isEmpty():
            break
        done = state.filter(~F.col("truncated"))
        advanced = pending.mapInPandas(advance, schema=state_schema)
        # localCheckpoint: cut lineage so round N's plan doesn't replay
        # rounds 1..N-1 (iterative-algorithm pattern)
        state = done.unionByName(advanced).localCheckpoint(eager=True)
    return state.select(
        F.col(id_col),
        F.col("acc").alias("line_items"),
        F.size(F.from_json("acc", "array<struct<line_no:int,sku:string>>")).alias(
            "n_items"
        ),
        F.col("rounds"),
    )
