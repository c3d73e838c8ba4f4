"""T3 — chunking.

Reference: SentenceSplitter(chunk_size=1024/512, overlap=128) per document
(unstract/sdk1/src/unstract/sdk1/vector_db.py:122-157); chunk_size=0 means
"no chunking" — the whole text is one node (sdk1/index.py:421-431).

Spark-first: fixed-size chunking is pure codegen (sequence + substring +
posexplode) — no Python in the hot path. The sentence-aware variant is a
mapInPandas stage for parity with the reference's splitter; both emit the
same (doc key, chunk_no, chunk_text) shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_fixed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 512,
    chunk_overlap: int = 128,
) -> DataFrame:
    """Fixed-size char chunking with overlap, JVM-side.

    stride = chunk_size - chunk_overlap; chunk i covers
    [i*stride, i*stride + chunk_size). chunk_size=0 short-circuits to
    the whole text as chunk 0 (reference chunk-size-0 semantics).
    """
    if chunk_size <= 0:
        return docs.select(
            F.col(id_col),
            F.lit(0).alias("chunk_no"),
            F.col(text_col).alias("chunk_text"),
        )
    stride = max(1, chunk_size - chunk_overlap)
    txt = F.col(text_col)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(txt) - F.lit(chunk_overlap)) / F.lit(stride)).cast("int"),
    )
    return docs.select(
        F.col(id_col),
        txt.alias("_t"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_no", "_i"),
    ).select(
        id_col,
        "chunk_no",
        F.substring(F.col("_t"), F.col("_i") * stride + 1, chunk_size).alias("chunk_text"),
    )


def chunk_sentences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 512,
    chunk_overlap: int = 128,
) -> DataFrame:
    """Sentence-aware chunking (reference SentenceSplitter semantics).

    Greedy sentence packing up to chunk_size chars with sentence-level
    overlap. Arrow-batched mapInPandas — the per-doc Python loop is the
    slow path, used only when sentence boundaries matter.
    """
    import re

    out_schema = f"{id_col} long, chunk_no int, chunk_text string"
    sent_rx = re.compile(r"(?<=[.!?])\s+")

    def split_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, texts = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sents = [s for s in sent_rx.split(text or "") if s] or [""]
                cur: list[str] = []
                cur_len = 0
                chunks: list[str] = []
                for s in sents:
                    if cur and cur_len + len(s) + 1 > chunk_size:
                        chunks.append(" ".join(cur))
                        # sentence-level overlap: retain tail sentences
                        keep: list[str] = []
                        keep_len = 0
                        for t in reversed(cur):
                            if keep_len + len(t) + 1 > chunk_overlap:
                                break
                            keep.insert(0, t)
                            keep_len += len(t) + 1
                        cur, cur_len = keep, keep_len
                    cur.append(s)
                    cur_len += len(s) + 1
                if cur:
                    chunks.append(" ".join(cur))
                for i, c in enumerate(chunks):
                    ids.append(did)
                    nos.append(i)
                    texts.append(c)
            yield pd.DataFrame({id_col: ids, "chunk_no": nos, "chunk_text": texts})

    return docs.select(id_col, text_col).mapInPandas(split_batch, schema=out_schema)
