"""Deterministic identity helpers.

The reference keys its idempotency on deterministic hashes:
- doc_id = sha256 over (file_hash + instance-id-less adapter configs +
  chunk params)  (reference: unstract/sdk1/src/unstract/sdk1/index.py:460-516)
- file cache_key = sha256 of content (reference: endpoint_v2/source.py:938-954)

We express the same keys as Column expressions so they are computed
JVM-side inside codegen, never in Python.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_hash(content: Column) -> Column:
    """sha256 hex of a binary/string column (the file cache_key)."""
    return F.sha2(content, 256)


def doc_id(
    file_hash: Column,
    *,
    embedding_config: str = "mock-embedding",
    x2text_config: str = "mock-x2text",
    chunk_size: int = 512,
    chunk_overlap: int = 128,
) -> Column:
    """Deterministic index-document id.

    Mirrors `generate_index_key`: sha256 over the sorted json of
    {file_hash, embedding, x2text, chunk_size, chunk_overlap}
    (reference: sdk1/index.py:460-516). Same inputs -> same id, which is
    what makes index upserts idempotent under task retry.
    """
    cfg = json.dumps(
        {
            "embedding": embedding_config,
            "x2text": x2text_config,
            "chunk_size": chunk_size,
            "chunk_overlap": chunk_overlap,
        },
        sort_keys=True,
    )
    return F.sha2(F.concat_ws("|", file_hash, F.lit(cfg)), 256)


def answer_cache_key(doc: Column, prompt_key: Column, prompt_text: Column) -> Column:
    """Cache key for one (document, prompt) LLM answer.

    Retries of a Spark task must not double-spend LLM tokens; the answer
    cache is keyed deterministically so a retry replays the cached row
    (SURVEY.md section 7 hard-part 1).
    """
    return F.sha2(F.concat_ws("|", doc, prompt_key, F.sha2(prompt_text, 256)), 256)
