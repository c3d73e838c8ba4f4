"""Real provider adapters — OpenAI-compatible HTTP (T4/T7).

The reference registers 11 LLM and 9 embedding providers behind litellm
(unstract/sdk1/src/unstract/sdk1/adapters/llm1/__init__.py:1-35,
adapters/embedding1/__init__.py:1-34); its "OpenAI Compatible" adapter
(adapters/llm1/openai_compatible.py, embedding1/openai_compatible.py)
targets any server speaking the OpenAI Chat Completions / Embeddings
API — vLLM, LM Studio, self-hosted gateways. That one adapter is the
provider long-tail's common denominator, so it is the one implemented
for real here; every other provider is the same client with a
different base_url/auth header.

Spark integration contract:
- LLM: `complete_rows(prompts, keys, fingerprints) -> list[dict]`
  (text + provider-reported token usage). The controller
  (operators/llm.py) prefers this over the mock's `complete_batch` and
  keeps its thread-pool fan-out + semaphore + retry outer layer — the
  adapter does ONE request per call and never retries internally, so
  retry/rate discipline lives in exactly one place.
- Embedding: `embed_batch(texts) -> ndarray` — the same batch contract
  as mock_embed_texts, pluggable into index_store.embed_chunks.

Transport is injected (same pattern as sinks/notify.py and
operators/variables.py): tests run against a local fake HTTP server;
the default transport is a stdlib urllib JSON POST.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

import numpy as np

JsonTransport = Callable[[str, dict, dict], dict]  # (url, payload, headers) -> parsed body


def http_json_transport(url: str, payload: dict, headers: dict, timeout_s: float = 60.0) -> dict:
    """POST JSON, parse JSON. Raises on non-2xx (urllib HTTPError) so the
    controller's retry layer sees transport failures as exceptions."""
    from urllib.request import Request, urlopen

    req = Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **headers},
    )
    with urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
        return json.loads(resp.read().decode())


class OpenAICompatibleLLM:
    """Chat Completions client for OpenAI-compatible servers.

    One request per prompt (the API has no prompt batching); the
    controller's thread pool supplies the parallelism. Deterministic by
    default: temperature 0.
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        temperature: float = 0.0,
        max_tokens: int | None = None,
        system_prompt: str | None = None,
        transport: JsonTransport | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.system_prompt = system_prompt
        self.transport = transport or http_json_transport

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}

    def complete_one(self, prompt: str) -> dict[str, Any]:
        messages = []
        if self.system_prompt:
            messages.append({"role": "system", "content": self.system_prompt})
        messages.append({"role": "user", "content": prompt or ""})
        payload: dict[str, Any] = {
            "model": self.model,
            "messages": messages,
            "temperature": self.temperature,
        }
        if self.max_tokens is not None:
            payload["max_tokens"] = self.max_tokens
        body = self.transport(
            f"{self.base_url}/chat/completions", payload, self._headers()
        )
        usage = body.get("usage") or {}
        return {
            "text": body["choices"][0]["message"]["content"],
            "prompt_tokens": usage.get("prompt_tokens"),
            "completion_tokens": usage.get("completion_tokens"),
        }

    def complete_rows(
        self, prompts: list[str], keys: list[str], fingerprints: list[str]
    ) -> list[dict[str, Any]]:
        """Controller contract: one result dict per row, in order."""
        return [self.complete_one(p) for p in prompts]


class OpenAICompatibleEmbedding:
    """Embeddings client for OpenAI-compatible servers — real request
    batching (the API accepts a list input), matching the
    mock_embed_texts batch contract."""

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        transport: JsonTransport | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.transport = transport or http_json_transport

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        headers = (
            {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        )
        body = self.transport(
            f"{self.base_url}/embeddings",
            {"model": self.model, "input": [t or "" for t in texts]},
            headers,
        )
        # the API may return out of order; index says where each goes
        out: list[list[float]] = [None] * len(texts)  # type: ignore[list-item]
        for item in body["data"]:
            out[item["index"]] = item["embedding"]
        return np.asarray(out, dtype=np.float32)
