"""F8 — prompt variable replacement: static, dynamic HTTP, custom data.

Reference semantics (workers/executor/executors/variable_replacement.py;
regex constants workers/executor/executors/constants.py:170-179):

- ``{{prompt_key}}`` (STATIC): replaced with the named prior prompt's
  output; a missing or empty output leaves the marker untouched
  (helper lines 27-54).
- ``{{http://host/path[field]}}`` (DYNAMIC): the prior output of
  ``field`` is POSTed (text/plain) to the URL; the response body —
  json.dumps'd when JSON — replaces the marker (lines 86-133,
  162-183). An empty ``field`` output leaves the marker untouched.
- ``{{custom_data.path.to.key}}`` (CUSTOM_DATA): nested lookup in the
  run's custom-data dict; a missing key is an error (lines 110-148).

Spark mapping: custom-data vars are plan-time constants and fold into
the template on the driver. Static vars are pure column expressions
(`replace` over prior-stage output columns) — fully JVM-side. Dynamic
vars are the engine's third external-call stage (after LLM and
webhooks): Arrow-batched `mapInPandas` with an injected transport,
thread-pool fan-out under the same process-global semaphore as the LLM
controller, per-(url, data) memoization within a task, and per-row
error isolation (the reference raises and fails the prompt; at 100 TB
a poisoned row must not kill the stage, so errors land in a
``var_error`` column with the marker left in place).

Stage ordering: `plans.fusion.plan_prompt_stages` treats a dynamic
variable's ``[field]`` as a dependency on that prompt, so prompts
feeding an HTTP variable always run in an earlier stage.
"""

from __future__ import annotations

import json
import re
import time
from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unstract_spark.operators.llm import _get_semaphore

VAR_RX = re.compile(r"\{\{(.+?)\}\}")
# simplified public-URL shape (the reference uses a Gruber-style regex,
# constants.py:175-178); the [field] suffix is excluded by the char class
URL_RX = re.compile(r"(?i)\b((?:https?://|www\d{0,3}\.)[^\s()<>\[\]{}]+)")
DATA_RX = re.compile(r"\[(.*?)\]")
CUSTOM_RX = re.compile(r"custom_data\.([a-zA-Z0-9_.]+)")
IDENT_RX = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")

Transport = Callable[[str, str], Any]  # (url, data) -> body (str or json obj)


def classify_variable(var: str) -> str:
    """'custom_data' | 'dynamic' | 'static' — reference precedence
    (variable_replacement.py:75-84 checks custom first, then URL)."""
    if CUSTOM_RX.search(var):
        return "custom_data"
    if URL_RX.search(var):
        return "dynamic"
    return "static"


def _format_value(value: Any) -> str:
    """Non-strings are json.dumps'd (handle_json_and_str_types)."""
    if isinstance(value, str):
        return value
    try:
        return json.dumps(value)
    except (ValueError, TypeError):
        return str(value)


def resolve_custom_data(path: str, custom_data: dict | None) -> str:
    """Nested dotted lookup; missing key raises (CustomDataError parity)."""
    if not custom_data:
        raise ValueError(f"custom data is not configured (variable: {path})")
    value: Any = custom_data
    try:
        for part in path.split("."):
            value = value[part]
    except (KeyError, TypeError) as e:
        raise ValueError(f"key '{path}' not found in custom data") from e
    return _format_value(value)


def http_transport(url: str, data: str, timeout_s: float = 30.0) -> Any:
    """Default transport: stdlib POST, text/plain body, JSON-aware reply
    (fetch_dynamic_variable_value parity). Tests inject a fake instead."""
    from urllib.request import Request, urlopen

    req = Request(url, data=data.encode(), headers={"Content-Type": "text/plain"})
    with urlopen(req, timeout=timeout_s) as resp:  # noqa: S310 (caller-supplied URL is the feature)
        body = resp.read().decode()
        if "application/json" in (resp.headers.get("Content-Type") or ""):
            return json.loads(body)
        return body


def replace_prompt_variables(
    df: DataFrame,
    template: str,
    custom_data: dict | None = None,
    transport: Transport | None = None,
    out_col: str = "prompt",
    max_retries: int = 3,
    backoff_s: float = 0.05,
    max_concurrency: int = 4,
) -> DataFrame:
    """Materialize per-row prompts from `template` over prior outputs.

    Static/custom markers resolve declaratively; dynamic markers add one
    mapInPandas stage (skipped entirely when the template has none, so
    the common case stays whole-stage codegen). Output adds `out_col`
    plus, when dynamic vars exist, a nullable `var_error`.
    """
    variables = VAR_RX.findall(template or "")
    dynamic: list[tuple[str, str, str]] = []  # (marker, url, field)

    resolved = template or ""
    for var in variables:
        kind = classify_variable(var)
        marker = "{{" + var + "}}"
        if kind == "custom_data":
            resolved = resolved.replace(
                marker, resolve_custom_data(CUSTOM_RX.search(var).group(1), custom_data)
            )
        elif kind == "dynamic":
            url = URL_RX.search(var).group(0)
            fields = DATA_RX.findall(var)
            dynamic.append((marker, url, fields[0] if fields else ""))

    expr: Column = F.lit(resolved)
    for var in variables:
        if classify_variable(var) != "static":
            continue
        marker = "{{" + var + "}}"
        if var not in df.columns:
            continue  # not executed yet -> marker stays (reference warns)
        value = F.col(var).cast("string")
        expr = F.replace(
            expr,
            F.lit(marker),
            F.when(value.isNotNull() & (value != ""), value).otherwise(F.lit(marker)),
        )

    staged = df.withColumn(out_col, expr)
    if not dynamic:
        return staged

    transport = transport or http_transport
    in_cols = staged.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in staged.schema.fields
    ) + ", var_error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sem = _get_semaphore("dynamic-vars", max_concurrency)
        cache: dict[tuple[str, str], Any] = {}  # (url, data) memo per task

        def fetch(url: str, data: str) -> Any:
            key = (url, data)
            if key not in cache:
                for attempt in range(max_retries):
                    with sem:
                        try:
                            cache[key] = transport(url, data)
                            break
                        except Exception:
                            if attempt == max_retries - 1:
                                raise
                    time.sleep(backoff_s * (3**attempt))
            return cache[key]

        def one_row(row: pd.Series) -> tuple[str, str | None]:
            prompt, err = row[out_col], None
            for marker, url, field in dynamic:
                data = str(row[field]) if field in row.index and pd.notna(row[field]) else ""
                if not data:
                    continue  # falsy output -> marker stays, like static
                try:
                    prompt = prompt.replace(marker, _format_value(fetch(url, data)))
                except Exception as e:  # noqa: BLE001 — per-row isolation
                    err = f"{type(e).__name__}: {e}"[:500]
            return prompt, err

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                results = list(pool.map(one_row, (r for _, r in pdf.iterrows())))
                out = pdf.copy()
                out[out_col] = [p for p, _ in results]
                out["var_error"] = pd.array(
                    [e for _, e in results], dtype="object"
                )
                yield out[in_cols + ["var_error"]]

    return staged.mapInPandas(run, schema=schema)
