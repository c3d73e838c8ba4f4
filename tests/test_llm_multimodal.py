"""LLM controller (batching, retry, concurrency bound, usage
side-output) + multimodal plumbing (fake decode, error isolation,
frame sampling)."""

import threading
import time

import pytest
from pyspark.sql import functions as F

from unstract_spark.mock import MockLLM
from unstract_spark.operators.llm import complete_with_controller
from unstract_spark.operators.multimodal import frame_sample_plan, image_features


@pytest.fixture(scope="module")
def prompt_rows(spark):
    return spark.createDataFrame(
        [(f"fp{i}", "field_a", f"extract field_a from doc {i}") for i in range(10)],
        "fingerprint string, prompt_key string, prompt string",
    )


def test_controller_answers_and_usage(prompt_rows):
    out = complete_with_controller(prompt_rows).collect()
    assert len(out) == 10
    for r in out:
        assert r.answer_raw.startswith("ans-") or r.answer_raw == "NA"
        assert r.total_tokens == r.prompt_tokens + r.completion_tokens
        assert r.model_name == "mock-llm"


def test_controller_matches_mock_function(prompt_rows):
    out = {r.fingerprint: r.answer_raw for r in complete_with_controller(prompt_rows).collect()}
    assert out["fp3"] == MockLLM._answer("field_a", "fp3")


def test_controller_retries_transient_errors(prompt_rows):
    # defined inside the test so cloudpickle ships it by value to executors
    class FlakyLLM(MockLLM):
        """Fails the first call per instance — exercises the retry path."""

        def complete_batch(self, keys, fingerprints):
            if self.calls == 0:
                self.calls += 1
                raise RuntimeError("transient provider error")
            return super().complete_batch(keys, fingerprints)

    out = complete_with_controller(prompt_rows, llm_factory=FlakyLLM, backoff_s=0.001).collect()
    assert len(out) == 10  # survived the injected failure


def test_controller_overlaps_inflight_calls(spark):
    """The concurrency bound is real: with a slow provider, calls in one
    task overlap on the thread pool (peak in-flight > 1) but never
    exceed max_concurrency. Observations ride back on the answers —
    the UDF runs in a separate worker process."""

    class SlowLLM(MockLLM):
        # locks are created lazily in-process: the class pickles to the
        # worker, the one instance per task is shared by pool threads
        def __init__(self):
            super().__init__()
            self._lock = threading.Lock()
            self._inflight = 0
            self._peak = 0

        def complete_batch(self, keys, fingerprints):
            with self._lock:
                self._inflight += 1
                self._peak = max(self._peak, self._inflight)
            time.sleep(0.15)
            with self._lock:
                peak = self._peak
                self._inflight -= 1
            return [f"peak={peak}"] * len(keys)

    rows = spark.createDataFrame(
        [(f"fp{i}", "k", "p") for i in range(8)],
        "fingerprint string, prompt_key string, prompt string",
    ).coalesce(1)  # ONE task: overlap must come from the pool, not Spark
    out = complete_with_controller(
        rows, llm_factory=SlowLLM, batch_size=1, max_concurrency=3,
        model_name="slow-test",
    ).collect()
    peaks = [int(r.answer_raw.split("=")[1]) for r in out]
    assert max(peaks) >= 2, "calls never overlapped — controller is sequential"
    assert max(peaks) <= 3, "semaphore bound exceeded"


def test_controller_retry_isolated_per_chunk(spark):
    """One flaky chunk retries alone: siblings are called exactly once
    (no duplicate provider spend on the healthy chunks)."""

    class PerChunkFlaky(MockLLM):
        def __init__(self):
            super().__init__()
            self._lock = threading.Lock()
            self._counts = {}

        def complete_batch(self, keys, fingerprints):
            with self._lock:
                for f in fingerprints:
                    self._counts[f] = self._counts.get(f, 0) + 1
                if "fp0" in fingerprints and self._counts["fp0"] == 1:
                    raise RuntimeError("transient on fp0")
                counts = dict(self._counts)
            return [f"calls={counts[f]}" for f in fingerprints]

    rows = spark.createDataFrame(
        [(f"fp{i}", "k", "p") for i in range(6)],
        "fingerprint string, prompt_key string, prompt string",
    ).coalesce(1)
    out = {
        r.fingerprint: r.answer_raw
        for r in complete_with_controller(
            rows, llm_factory=PerChunkFlaky, batch_size=1, backoff_s=0.001,
            model_name="flaky-test",
        ).collect()
    }
    assert out["fp0"] == "calls=2"  # failed once, retried once
    for i in range(1, 6):
        assert out[f"fp{i}"] == "calls=1"  # siblings untouched by the retry


def test_image_features_fake_decode(spark):
    df = spark.createDataFrame(
        [("/img/a.png", b"payload-a"), ("/img/b.png", b"payload-b")],
        "file_path string, content binary",
    )
    rows = {r.file_path: r for r in image_features(df, fake=True).collect()}
    assert len(rows["/img/a.png"].feat) == 6  # mean, std, hist4
    assert rows["/img/a.png"].decode_error is None
    assert rows["/img/a.png"].feat != rows["/img/b.png"].feat  # content-dependent


def test_image_decode_stub_isolates_errors(spark):
    # a payload matching no decoder's magic bytes (JPEG is real now —
    # see minijpeg.py — so only truly unknown formats hit the stub)
    df = spark.createDataFrame([("/img/a.bin", b"x")], "file_path string, content binary")
    rows = image_features(df, fake=False).collect()
    assert rows[0].feat is None
    assert "unsupported image format" in rows[0].decode_error  # row error, job survived


def test_frame_sample_plan_explodes(spark):
    df = spark.createDataFrame(
        [("/v/clip.mp4", b"x" * (1024 * 90))], "file_path string, content binary"
    )
    rows = frame_sample_plan(df, every_n=30).collect()
    assert len(rows) == 3  # ~91 est frames -> samples at 0, 30, 60
    assert [r.frame_number for r in rows] == [0, 30, 60]
