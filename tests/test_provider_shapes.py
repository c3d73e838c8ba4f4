"""Anthropic/Gemini/Bedrock wire-shape adapters (T4/T7 provider
breadth): request-shape assertions over recording transports, usage
extraction parity, registry dispatch, and a real local-HTTP run through
the Spark controller for each protocol.

Reference: adapters/llm1/{anthropic,gemini,bedrock}.py and
adapters/embedding1/{gemini,bedrock}.py register these providers behind
litellm; the engine speaks each public protocol directly.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from unstract_spark.operators.index_store import embed_chunks
from unstract_spark.operators.llm import complete_with_controller
from unstract_spark.providers import (
    AnthropicMessagesLLM,
    BedrockConverseLLM,
    BedrockTitanEmbedding,
    GeminiEmbedding,
    GeminiGenerateContentLLM,
    OpenAICompatibleLLM,
    list_embedding_providers,
    list_llm_providers,
    make_embedding,
    make_llm,
)


class _Recorder:
    """Transport double that records the request and returns a canned
    body."""

    def __init__(self, body):
        self.body = body
        self.calls = []

    def __call__(self, url, payload, headers):
        self.calls.append((url, payload, headers))
        return self.body


# -- request/response shape per protocol ---------------------------------


def test_anthropic_messages_shape_and_usage():
    rec = _Recorder(
        {
            "content": [
                {"type": "text", "text": "Hello "},
                {"type": "text", "text": "world"},
            ],
            "usage": {"input_tokens": 12, "output_tokens": 3},
        }
    )
    llm = AnthropicMessagesLLM(
        "https://api.example.com",
        model="m1",
        api_key="sk-test",
        system_prompt="be terse",
        max_tokens=64,
        transport=rec,
    )
    out = llm.complete_one("hi")
    assert out == {"text": "Hello world", "prompt_tokens": 12, "completion_tokens": 3}
    url, payload, headers = rec.calls[0]
    assert url == "https://api.example.com/v1/messages"
    assert headers["x-api-key"] == "sk-test"
    assert headers["anthropic-version"] == AnthropicMessagesLLM.API_VERSION
    # system is a TOP-LEVEL field, not a message role; max_tokens required
    assert payload["system"] == "be terse"
    assert payload["max_tokens"] == 64
    assert payload["messages"] == [{"role": "user", "content": "hi"}]
    assert all(m["role"] != "system" for m in payload["messages"])


def test_gemini_generate_content_shape_and_usage():
    rec = _Recorder(
        {
            "candidates": [
                {"content": {"role": "model", "parts": [{"text": "answer"}]}}
            ],
            "usageMetadata": {"promptTokenCount": 9, "candidatesTokenCount": 2},
        }
    )
    llm = GeminiGenerateContentLLM(
        "https://gen.example.com",
        model="g1",
        api_key="key-g",
        system_prompt="sys",
        max_tokens=32,
        transport=rec,
    )
    out = llm.complete_one("q")
    assert out == {"text": "answer", "prompt_tokens": 9, "completion_tokens": 2}
    url, payload, headers = rec.calls[0]
    assert url == "https://gen.example.com/v1beta/models/g1:generateContent"
    assert headers["x-goog-api-key"] == "key-g"
    assert payload["contents"] == [{"role": "user", "parts": [{"text": "q"}]}]
    assert payload["systemInstruction"] == {"parts": [{"text": "sys"}]}
    assert payload["generationConfig"]["maxOutputTokens"] == 32


def test_bedrock_converse_shape_and_usage():
    rec = _Recorder(
        {
            "output": {
                "message": {"role": "assistant", "content": [{"text": "ok"}]}
            },
            "usage": {"inputTokens": 5, "outputTokens": 1},
        }
    )
    llm = BedrockConverseLLM(
        "https://bedrock.example.com",
        model="mod.x-v1",
        system_prompt="sys",
        max_tokens=16,
        transport=rec,
    )
    out = llm.complete_one("p")
    assert out == {"text": "ok", "prompt_tokens": 5, "completion_tokens": 1}
    url, payload, _ = rec.calls[0]
    assert url == "https://bedrock.example.com/model/mod.x-v1/converse"
    assert payload["messages"] == [{"role": "user", "content": [{"text": "p"}]}]
    assert payload["system"] == [{"text": "sys"}]
    assert payload["inferenceConfig"]["maxTokens"] == 16


def test_gemini_embedding_batches_in_order():
    rec = _Recorder(
        {"embeddings": [{"values": [1.0, 0.0]}, {"values": [0.0, 1.0]}]}
    )
    emb = GeminiEmbedding(
        "https://gen.example.com", model="e1", api_key="k", transport=rec
    )
    arr = emb.embed_batch(["a", "b"])
    assert arr.shape == (2, 2) and arr[0][0] == 1.0 and arr[1][1] == 1.0
    url, payload, headers = rec.calls[0]
    assert url == "https://gen.example.com/v1beta/models/e1:batchEmbedContents"
    assert headers["x-goog-api-key"] == "k"
    assert [r["content"]["parts"][0]["text"] for r in payload["requests"]] == [
        "a",
        "b",
    ]


def test_bedrock_titan_embedding_one_request_per_text():
    class PerText:
        def __init__(self):
            self.calls = []

        def __call__(self, url, payload, headers):
            self.calls.append(payload["inputText"])
            return {"embedding": [float(len(payload["inputText"])), 0.0]}

    rec = PerText()
    emb = BedrockTitanEmbedding("https://bedrock.example.com", "titan-v2", rec)
    arr = emb.embed_batch(["ab", "abcd", None])
    assert rec.calls == ["ab", "abcd", ""]  # no batch API: one call each
    assert arr[0][0] == 2.0 and arr[1][0] == 4.0 and arr[2][0] == 0.0


# -- registry ------------------------------------------------------------


def test_provider_registry_collapses_to_four_shapes():
    assert isinstance(make_llm("anthropic", "http://x", "m"), AnthropicMessagesLLM)
    assert isinstance(make_llm("gemini", "http://x", "m"), GeminiGenerateContentLLM)
    assert isinstance(make_llm("vertexai", "http://x", "m"), GeminiGenerateContentLLM)
    assert isinstance(make_llm("bedrock", "http://x", "m"), BedrockConverseLLM)
    for name in ("openai", "azure_openai", "ollama", "openrouter", "mistral"):
        assert isinstance(make_llm(name, "http://x", "m"), OpenAICompatibleLLM)
    assert isinstance(make_embedding("gemini", "http://x", "m"), GeminiEmbedding)
    assert isinstance(
        make_embedding("bedrock", "http://x", "m"), BedrockTitanEmbedding
    )
    with pytest.raises(KeyError, match="unknown LLM provider"):
        make_llm("palm", "http://x", "m")
    with pytest.raises(KeyError, match="unknown embedding provider"):
        make_embedding("anthropic", "http://x", "m")  # no embeddings API
    # the reference's provider names all resolve
    assert {"anthropic", "gemini", "bedrock", "openai_compatible"} <= set(
        list_llm_providers()
    )
    assert {"gemini", "bedrock", "azure_openai"} <= set(list_embedding_providers())


# -- Spark controller integration over a real local HTTP server ----------


class _MultiProviderServer:
    """One local server speaking all four wire protocols, so controller
    runs exercise real HTTP from Spark worker processes."""

    def __init__(self):
        self.lock = threading.Lock()
        self.hits = {"anthropic": 0, "gemini": 0, "bedrock": 0, "titan": 0}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _reply(self, obj):
                body = json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                payload = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                if self.path.endswith("/v1/messages"):
                    assert self.headers["anthropic-version"]
                    prompt = payload["messages"][-1]["content"]
                    with outer.lock:
                        outer.hits["anthropic"] += 1
                    self._reply(
                        {
                            "content": [{"type": "text", "text": f"ant[{prompt}]"}],
                            "usage": {
                                "input_tokens": 100 + len(prompt),
                                "output_tokens": 5,
                            },
                        }
                    )
                elif ":generateContent" in self.path:
                    prompt = payload["contents"][-1]["parts"][0]["text"]
                    with outer.lock:
                        outer.hits["gemini"] += 1
                    self._reply(
                        {
                            "candidates": [
                                {"content": {"parts": [{"text": f"gem[{prompt}]"}]}}
                            ],
                            "usageMetadata": {
                                "promptTokenCount": 200 + len(prompt),
                                "candidatesTokenCount": 6,
                            },
                        }
                    )
                elif self.path.endswith("/converse"):
                    prompt = payload["messages"][-1]["content"][0]["text"]
                    with outer.lock:
                        outer.hits["bedrock"] += 1
                    self._reply(
                        {
                            "output": {
                                "message": {"content": [{"text": f"bed[{prompt}]"}]}
                            },
                            "usage": {
                                "inputTokens": 300 + len(prompt),
                                "outputTokens": 7,
                            },
                        }
                    )
                elif self.path.endswith("/invoke"):
                    text = payload["inputText"]
                    with outer.lock:
                        outer.hits["titan"] += 1
                    self._reply({"embedding": [float(len(text)), 1.0, 0.0, 0.0]})
                else:
                    self._reply({"error": "not found"})

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}"
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture(scope="module")
def multi_server():
    s = _MultiProviderServer()
    yield s
    s.close()


@pytest.mark.parametrize(
    ("provider", "prefix", "base_usage"),
    [("anthropic", "ant", 100), ("gemini", "gem", 200), ("bedrock", "bed", 300)],
)
def test_controller_runs_each_protocol(
    spark, multi_server, provider, prefix, base_usage
):
    url = multi_server.url  # bind: the server object itself can't pickle
    df = spark.createDataFrame(
        [(f"fp{i}", "k", f"doc {i}") for i in range(4)],
        "fingerprint string, prompt_key string, prompt string",
    ).coalesce(1)
    out = complete_with_controller(
        df,
        llm_factory=lambda: make_llm(provider, url, model="m"),
        batch_size=2,
        model_name=f"{provider}-m",
    ).collect()
    assert len(out) == 4
    for r in out:
        assert r.answer_raw == f"{prefix}[{r.prompt}]"
        # provider-reported usage reached the ledger columns
        assert r.prompt_tokens == base_usage + len(r.prompt)
        assert r.model_name == f"{provider}-m"
    assert multi_server.hits[provider] >= 4


def test_embed_chunks_through_titan(spark, multi_server):
    url = multi_server.url
    chunks = spark.createDataFrame(
        [(1, "ab"), (2, "abcdef")], "chunk_id long, chunk_text string"
    ).coalesce(1)
    rows = {
        r.chunk_id: r.embedding
        for r in embed_chunks(
            chunks,
            embed_factory=lambda: make_embedding(
                "bedrock", url, model="titan-v2"
            ).embed_batch,
        ).collect()
    }
    assert rows[1][0] == 2.0 and rows[2][0] == 6.0
    assert multi_server.hits["titan"] == 2
