"""T1/T2 — text extraction (the x2text adapter surface).

Reference: `extract_text(x2text_id, file_path, ...)` dispatches to
LLMWhisperer / Unstructured / LlamaParse / no-op adapters
(sdk1/index.py:133-217; adapters under sdk1/adapters/x2text/). Each
takes one document's bytes and yields text (+ page count, artifacts).

Spark-first adapter contract: an adapter is a pure function
`bytes -> (text, page_count)` registered per MIME type; extraction runs
as ONE Arrow-batched mapInPandas over the catalog with row-level error
isolation (a bad document becomes an ERROR row, the job never fails —
legacy_executor.py:159-163). Remote adapters (LLMWhisperer HTTP, OCR)
plug in as functions that call out — the batching/retry discipline of
operators/llm.py applies to them unchanged.

In-container adapters: utf-8 text, JSON (string-value flattening),
CSV (tabular -> line text). PDF/image adapters raise NotImplementedError
until their libs are present — the dispatch, schema and error paths are
identical, so swapping in a real parser touches only the registry.
"""

from __future__ import annotations

import csv
import io
import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

Adapter = Callable[[bytes], tuple[str, int]]

PAGE_CHARS = 3000  # chars per accounted "page" (usage A4 input)


def _pages(text: str) -> int:
    return max(1, -(-len(text) // PAGE_CHARS))


def extract_plain(content: bytes) -> tuple[str, int]:
    text = content.decode("utf-8")  # strict: undecodable -> ERROR row
    return text, _pages(text)


def extract_json(content: bytes) -> tuple[str, int]:
    """Flatten all string values of a JSON document, depth-first —
    the 'text of' a structured payload."""
    doc = json.loads(content.decode("utf-8"))
    parts: list[str] = []

    def walk(v) -> None:
        if isinstance(v, str):
            parts.append(v)
        elif isinstance(v, dict):
            for x in v.values():
                walk(x)
        elif isinstance(v, list):
            for x in v:
                walk(x)

    walk(doc)
    text = "\n".join(parts)
    return text, _pages(text)


def extract_csv(content: bytes) -> tuple[str, int]:
    rows = csv.reader(io.StringIO(content.decode("utf-8")))
    text = "\n".join(" ".join(cells) for cells in rows)
    return text, _pages(text)


def extract_pdf_stub(content: bytes) -> tuple[str, int]:
    raise NotImplementedError(
        "PDF extraction needs a parser (pypdf/tika not in this container); "
        "register a real adapter for application/pdf"
    )


DEFAULT_ADAPTERS: dict[str, Adapter] = {
    "text/plain": extract_plain,
    "text/csv": extract_csv,
    "application/json": extract_json,
    "application/pdf": extract_pdf_stub,
}


def extract_text(
    catalog: DataFrame,
    adapters: dict[str, Adapter] | None = None,
    content_col: str = "content",
    mime_col: str = "mime_type",
    id_col: str = "file_hash",
) -> DataFrame:
    """Run MIME-dispatched extraction over catalog rows.

    Output: (id, extracted_text, page_count, status, error_message).
    Unknown MIME and adapter failures are ERROR rows, isolated per file.
    """
    adapters = adapters or DEFAULT_ADAPTERS
    out_schema = (
        f"{id_col} string, extracted_text string, page_count int,"
        " status string, error_message string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts, pages, statuses, errors = [], [], [], [], []
            for rid, mime, content in zip(pdf[id_col], pdf[mime_col], pdf[content_col]):
                ids.append(rid)
                adapter = adapters.get(mime)
                if adapter is None:
                    texts.append(None); pages.append(0)
                    statuses.append("ERROR")
                    errors.append(f"no extraction adapter for {mime}")
                    continue
                try:
                    text, n = adapter(bytes(content) if content is not None else b"")
                    texts.append(text); pages.append(n)
                    statuses.append("SUCCESS"); errors.append(None)
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    texts.append(None); pages.append(0)
                    statuses.append("ERROR"); errors.append(str(e)[:200])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "extracted_text": texts,
                    "page_count": pages,
                    "status": statuses,
                    "error_message": errors,
                }
            )

    return catalog.select(id_col, mime_col, content_col).mapInPandas(run, schema=out_schema)
