"""Real provider adapters — the four LLM/embedding wire protocols (T4/T7).

The reference registers 15 LLM and 9 embedding providers behind litellm
(unstract/sdk1/src/unstract/sdk1/adapters/llm1/__init__.py:1-35,
adapters/embedding1/__init__.py:1-34). Those providers collapse onto
FOUR distinct wire protocols, all implemented here directly:

- OpenAI Chat Completions / Embeddings (`OpenAICompatible*`) — native
  OpenAI plus every compatible gateway (vLLM, LM Studio, Azure OpenAI,
  Ollama, Anyscale, OpenRouter, Mistral, MiniMax, NVIDIA Build).
- Anthropic Messages (`AnthropicMessagesLLM`).
- Gemini generateContent / batchEmbedContents (`Gemini*` — AI Studio
  and Vertex share the shape).
- Bedrock Converse / InvokeModel (`Bedrock*` — SigV4 signing is a
  transport concern, behind the injected-transport seam).

`make_llm(provider, ...)` / `make_embedding(provider, ...)` map every
reference provider name to the class speaking its protocol.

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


class AnthropicMessagesLLM:
    """Anthropic Messages-API client (the second of the reference's
    four distinct LLM wire protocols).

    Reference parity: adapters/llm1/anthropic.py registers provider
    "anthropic" (get_id anthropic|90ebd4cd..., get_provider at
    anthropic.py:30-32) and delegates the wire work to litellm; the
    public protocol is implemented here directly — POST /v1/messages
    with an `x-api-key` + `anthropic-version` header pair, `system` as
    a top-level field (not a message role), a REQUIRED `max_tokens`,
    and usage reported as {input_tokens, output_tokens}.

    Same controller contract as OpenAICompatibleLLM: one request per
    prompt, no internal retry, deterministic temperature 0.
    """

    API_VERSION = "2023-06-01"

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        temperature: float = 0.0,
        max_tokens: int = 1024,  # the API requires it
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
        h = {"anthropic-version": self.API_VERSION}
        if self.api_key:
            h["x-api-key"] = self.api_key
        return h

    def complete_one(self, prompt: str) -> dict[str, Any]:
        payload: dict[str, Any] = {
            "model": self.model,
            "max_tokens": self.max_tokens,
            "temperature": self.temperature,
            "messages": [{"role": "user", "content": prompt or ""}],
        }
        if self.system_prompt:
            payload["system"] = self.system_prompt
        body = self.transport(f"{self.base_url}/v1/messages", payload, self._headers())
        usage = body.get("usage") or {}
        text = "".join(
            block.get("text", "")
            for block in body.get("content") or []
            if block.get("type") == "text"
        )
        return {
            "text": text,
            "prompt_tokens": usage.get("input_tokens"),
            "completion_tokens": usage.get("output_tokens"),
        }

    def complete_rows(
        self, prompts: list[str], keys: list[str], fingerprints: list[str]
    ) -> list[dict[str, Any]]:
        return [self.complete_one(p) for p in prompts]


class GeminiGenerateContentLLM:
    """Gemini generateContent client (Google AI Studio wire shape).

    Reference parity: adapters/llm1/gemini.py ("gemini|085f6c03...",
    provider gemini.py:30-32) and adapters/llm1/vertexai.py share this
    protocol — POST /v1beta/models/{model}:generateContent with an
    `x-goog-api-key` header, `contents` role/parts arrays, a separate
    `systemInstruction`, generationConfig for sampling, and usage in
    `usageMetadata` {promptTokenCount, candidatesTokenCount}.
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
        return {"x-goog-api-key": self.api_key} if self.api_key else {}

    def complete_one(self, prompt: str) -> dict[str, Any]:
        gen_cfg: dict[str, Any] = {"temperature": self.temperature}
        if self.max_tokens is not None:
            gen_cfg["maxOutputTokens"] = self.max_tokens
        payload: dict[str, Any] = {
            "contents": [{"role": "user", "parts": [{"text": prompt or ""}]}],
            "generationConfig": gen_cfg,
        }
        if self.system_prompt:
            payload["systemInstruction"] = {"parts": [{"text": self.system_prompt}]}
        body = self.transport(
            f"{self.base_url}/v1beta/models/{self.model}:generateContent",
            payload,
            self._headers(),
        )
        usage = body.get("usageMetadata") or {}
        cand = (body.get("candidates") or [{}])[0]
        text = "".join(
            p.get("text", "") for p in (cand.get("content") or {}).get("parts") or []
        )
        return {
            "text": text,
            "prompt_tokens": usage.get("promptTokenCount"),
            "completion_tokens": usage.get("candidatesTokenCount"),
        }

    def complete_rows(
        self, prompts: list[str], keys: list[str], fingerprints: list[str]
    ) -> list[dict[str, Any]]:
        return [self.complete_one(p) for p in prompts]


class BedrockConverseLLM:
    """AWS Bedrock Converse-API client (the unified Bedrock chat shape).

    Reference parity: adapters/llm1/bedrock.py ("bedrock|8d18571f...",
    provider bedrock.py:30-32). The runtime wire protocol is POST
    /model/{modelId}/converse with role/content-block messages, a
    top-level `system` block list, `inferenceConfig` for sampling, and
    usage as {inputTokens, outputTokens}.

    Auth note: a live Bedrock endpoint authenticates with AWS SigV4
    request signing, which is a property of the TRANSPORT (it signs
    headers over the serialized body), not of this request shape — so
    it lives behind the injected-transport seam, exactly where a
    boto3- or SigV4-signing transport would plug in. Tests exercise the
    shape over an unsigned local transport.
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        temperature: float = 0.0,
        max_tokens: int | None = None,
        system_prompt: str | None = None,
        transport: JsonTransport | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.system_prompt = system_prompt
        self.transport = transport or http_json_transport

    def complete_one(self, prompt: str) -> dict[str, Any]:
        inf_cfg: dict[str, Any] = {"temperature": self.temperature}
        if self.max_tokens is not None:
            inf_cfg["maxTokens"] = self.max_tokens
        payload: dict[str, Any] = {
            "messages": [{"role": "user", "content": [{"text": prompt or ""}]}],
            "inferenceConfig": inf_cfg,
        }
        if self.system_prompt:
            payload["system"] = [{"text": self.system_prompt}]
        body = self.transport(
            f"{self.base_url}/model/{self.model}/converse", payload, {}
        )
        usage = body.get("usage") or {}
        msg = (body.get("output") or {}).get("message") or {}
        text = "".join(b.get("text", "") for b in msg.get("content") or [])
        return {
            "text": text,
            "prompt_tokens": usage.get("inputTokens"),
            "completion_tokens": usage.get("outputTokens"),
        }

    def complete_rows(
        self, prompts: list[str], keys: list[str], fingerprints: list[str]
    ) -> list[dict[str, Any]]:
        return [self.complete_one(p) for p in prompts]


class GeminiEmbedding:
    """Gemini batchEmbedContents client — real request batching, same
    `embed_batch` contract as OpenAICompatibleEmbedding.

    Reference parity: adapters/embedding1/gemini.py + vertexai.py. Wire
    shape: POST /v1beta/models/{model}:batchEmbedContents with one
    request object per text; responses come back in request order as
    {embeddings: [{values: [...]}]}.
    """

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
        headers = {"x-goog-api-key": self.api_key} if self.api_key else {}
        body = self.transport(
            f"{self.base_url}/v1beta/models/{self.model}:batchEmbedContents",
            {
                "requests": [
                    {
                        "model": f"models/{self.model}",
                        "content": {"parts": [{"text": t or ""}]},
                    }
                    for t in texts
                ]
            },
            headers,
        )
        return np.asarray(
            [e["values"] for e in body["embeddings"]], dtype=np.float32
        )


class BedrockTitanEmbedding:
    """Bedrock Titan embedding client — the invoke-model wire shape.

    Reference parity: adapters/embedding1/bedrock.py. Titan's protocol
    is POST /model/{modelId}/invoke with {"inputText": ...} per text
    (the API has NO batch input — same per-item fan-out the reference
    inherits from litellm), returning {"embedding": [...]}. SigV4
    signing is a transport concern, as in BedrockConverseLLM.
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        transport: JsonTransport | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.transport = transport or http_json_transport

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        out = []
        for t in texts:
            body = self.transport(
                f"{self.base_url}/model/{self.model}/invoke",
                {"inputText": t or ""},
                {},
            )
            out.append(body["embedding"])
        return np.asarray(out, dtype=np.float32)


# -- provider registry ----------------------------------------------------
#
# The reference registers 15 LLM and 9 embedding adapters
# (adapters/llm1/__init__.py:1-35, adapters/embedding1/__init__.py:1-34),
# but they collapse onto FOUR distinct wire protocols; everything else is
# a base_url/auth spelling. This mapping is that collapse, made explicit:
# ask for any reference provider name, get the client class that speaks
# its protocol.

_LLM_PROVIDERS: dict[str, type] = {
    # OpenAI Chat Completions protocol (native or compatible gateways)
    "openai": OpenAICompatibleLLM,
    "openai_compatible": OpenAICompatibleLLM,
    "azure_openai": OpenAICompatibleLLM,
    "azure_ai_foundry": OpenAICompatibleLLM,
    "ollama": OpenAICompatibleLLM,
    "anyscale": OpenAICompatibleLLM,
    "openrouter": OpenAICompatibleLLM,
    "mistral": OpenAICompatibleLLM,
    "minimax": OpenAICompatibleLLM,
    "nvidia_build": OpenAICompatibleLLM,
    # Anthropic Messages protocol
    "anthropic": AnthropicMessagesLLM,
    # Gemini generateContent protocol (AI Studio + Vertex share it)
    "gemini": GeminiGenerateContentLLM,
    "vertexai": GeminiGenerateContentLLM,
    # Bedrock Converse protocol
    "bedrock": BedrockConverseLLM,
}

_EMBEDDING_PROVIDERS: dict[str, type] = {
    "openai": OpenAICompatibleEmbedding,
    "openai_compatible": OpenAICompatibleEmbedding,
    "azure_openai": OpenAICompatibleEmbedding,
    "ollama": OpenAICompatibleEmbedding,
    "mistral": OpenAICompatibleEmbedding,
    "nvidia_build": OpenAICompatibleEmbedding,
    "gemini": GeminiEmbedding,
    "vertexai": GeminiEmbedding,
    "bedrock": BedrockTitanEmbedding,
}


def make_llm(provider: str, base_url: str, model: str, **kwargs):
    """Instantiate the LLM client that speaks `provider`'s protocol."""
    cls = _LLM_PROVIDERS.get(provider)
    if cls is None:
        known = ", ".join(sorted(_LLM_PROVIDERS))
        raise KeyError(f"unknown LLM provider {provider!r}. Known: {known}")
    return cls(base_url, model, **kwargs)


def make_embedding(provider: str, base_url: str, model: str, **kwargs):
    """Instantiate the embedding client for `provider`'s protocol."""
    cls = _EMBEDDING_PROVIDERS.get(provider)
    if cls is None:
        known = ", ".join(sorted(_EMBEDDING_PROVIDERS))
        raise KeyError(f"unknown embedding provider {provider!r}. Known: {known}")
    return cls(base_url, model, **kwargs)


def list_llm_providers() -> list[str]:
    return sorted(_LLM_PROVIDERS)


def list_embedding_providers() -> list[str]:
    return sorted(_EMBEDDING_PROVIDERS)
