"""OpenAI-compatible provider adapters against a real local HTTP server:
batching, retry via the controller, provider-reported usage accounting,
and embedding response reordering."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from unstract_spark.operators.index_store import embed_chunks
from unstract_spark.operators.llm import complete_with_controller
from unstract_spark.providers import OpenAICompatibleEmbedding, OpenAICompatibleLLM


class _FakeOpenAIServer:
    """Minimal OpenAI-compatible endpoint. Runs in the test process, so
    request counts are directly assertable even though clients live in
    Spark worker processes."""

    def __init__(self):
        self.lock = threading.Lock()
        self.requests = {"chat": 0, "embed": 0}
        self.failed_once: set[str] = set()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _reply(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                payload = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                if self.path.endswith("/chat/completions"):
                    prompt = payload["messages"][-1]["content"]
                    with outer.lock:
                        outer.requests["chat"] += 1
                        if "FLAKY" in prompt and prompt not in outer.failed_once:
                            outer.failed_once.add(prompt)
                            self._reply({"error": "transient"}, code=500)
                            return
                    self._reply(
                        {
                            "choices": [
                                {"message": {"role": "assistant",
                                             "content": f"echo[{prompt}]"}}
                            ],
                            "usage": {
                                "prompt_tokens": 1000 + len(prompt),
                                "completion_tokens": 7,
                                "total_tokens": 1007 + len(prompt),
                            },
                        }
                    )
                elif self.path.endswith("/embeddings"):
                    with outer.lock:
                        outer.requests["embed"] += 1
                    data = [
                        {"index": i,
                         "embedding": [float(len(t)), float(i), 1.0, 0.0]}
                        for i, t in enumerate(payload["input"])
                    ]
                    self._reply({"data": list(reversed(data))})  # out of order
                else:
                    self._reply({"error": "not found"}, code=404)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}/v1"
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture(scope="module")
def fake_server():
    srv = _FakeOpenAIServer()
    yield srv
    srv.close()


def test_llm_adapter_through_controller(spark, fake_server):
    url = fake_server.url
    df = spark.createDataFrame(
        [(f"fp{i}", "k", f"summarize doc {i}") for i in range(6)],
        "fingerprint string, prompt_key string, prompt string",
    ).coalesce(1)
    out = complete_with_controller(
        df,
        llm_factory=lambda: OpenAICompatibleLLM(url, model="test-model"),
        batch_size=2,
        model_name="test-model",
    ).collect()
    assert len(out) == 6
    for r in out:
        assert r.answer_raw == f"echo[{r.prompt}]"
        # provider-reported usage, not the whitespace estimate
        assert r.prompt_tokens == 1000 + len(r.prompt)
        assert r.completion_tokens == 7
        assert r.total_tokens == r.prompt_tokens + r.completion_tokens
    assert fake_server.requests["chat"] >= 6  # one request per prompt


def test_llm_adapter_retry_on_500(spark, fake_server):
    url = fake_server.url  # bind: the server object itself can't pickle
    before = fake_server.requests["chat"]
    df = spark.createDataFrame(
        [("fpA", "k", "FLAKY please"), ("fpB", "k", "steady")],
        "fingerprint string, prompt_key string, prompt string",
    ).coalesce(1)
    out = {
        r.fingerprint: r.answer_raw
        for r in complete_with_controller(
            df,
            llm_factory=lambda: OpenAICompatibleLLM(url, model="m"),
            batch_size=1,
            backoff_s=0.001,
            model_name="flaky-model",
        ).collect()
    }
    # first attempt 500s, controller retried, answer landed
    assert out["fpA"] == "echo[FLAKY please]"
    assert out["fpB"] == "echo[steady]"
    assert fake_server.requests["chat"] - before == 3  # 2 prompts + 1 retry


def test_embedding_adapter_batches_and_reorders(spark, fake_server):
    url = fake_server.url
    chunks = spark.createDataFrame(
        [(1, "ab"), (2, "abcd"), (3, "x")], "chunk_id long, chunk_text string"
    ).coalesce(1)
    rows = {
        r.chunk_id: r.embedding
        for r in embed_chunks(
            chunks,
            embed_factory=lambda: OpenAICompatibleEmbedding(url, model="emb").embed_batch,
        ).collect()
    }
    # index-based reordering undid the server's reversed response
    assert rows[1][0] == 2.0 and rows[2][0] == 4.0 and rows[3][0] == 1.0
    assert fake_server.requests["embed"] == 1  # one batched request for all rows
