"""Gates for the distributed logistic-regression trainer.

Float partial-sum order is run-dependent, so the trainer is
pytest-gated (the HNSW precedent), three ways: the training curve
must decrease, a separable problem must be solved exactly, and the
distributed fit must agree with the in-driver numpy twin to float
tolerance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from unstract_spark.operators import linear_model as lm


def _make_blobs(n_per=60, dim=6, gap=3.0, seed=7):
    rng = np.random.RandomState(seed)
    x0 = rng.randn(n_per, dim) - gap / 2
    x1 = rng.randn(n_per, dim) + gap / 2
    x = np.vstack([x0, x1])
    y = np.array([0] * n_per + [1] * n_per)
    return x, y


def _frame(spark, x, y):
    rows = [(xi.tolist(), int(yi)) for xi, yi in zip(x, y)]
    return spark.createDataFrame(
        rows, "features array<double>, label int"
    ).repartition(4)


def test_loss_decreases_and_separates(spark):
    x, y = _make_blobs()
    df = _frame(spark, x, y)
    w, hist = lm.train_logistic(
        df, dim=x.shape[1], iters=15, lr=2.0, return_history=True
    )
    assert hist[-1] < hist[0] / 4
    assert all(b <= a + 1e-9 for a, b in zip(hist, hist[1:]))
    scored = lm.logistic_score(df, w).collect()
    acc = np.mean([(r.score > 0.5) == (r.label == 1) for r in scored])
    assert acc == 1.0


def test_agrees_with_numpy_reference(spark):
    x, y = _make_blobs(n_per=40, dim=5, gap=1.0, seed=3)
    df = _frame(spark, x, y)
    w = lm.train_logistic(df, dim=5, iters=10, lr=1.0, l2=0.01)
    ref = lm.train_logistic_reference(x, y, iters=10, lr=1.0, l2=0.01)
    assert np.allclose(w, ref, rtol=1e-8, atol=1e-9)


def test_scoring_is_native_no_python(spark):
    # the corpus-side scoring pass must stay JVM-side: no
    # BatchEvalPython / ArrowEvalPython / mapInPandas in the plan
    x, y = _make_blobs(n_per=10, dim=4)
    df = _frame(spark, x, y)
    w = np.array([0.5, -0.25, 0.1, 0.0, 0.2])
    plan = lm.logistic_score(df, w)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_empty_frame_raises(spark):
    df = spark.createDataFrame([], "features array<double>, label int")
    with pytest.raises(ValueError):
        lm.train_logistic(df, dim=3, iters=1)


def test_l2_shrinks_weights(spark):
    x, y = _make_blobs(n_per=30, dim=4, gap=2.0, seed=11)
    df = _frame(spark, x, y)
    w_free = lm.train_logistic(df, dim=4, iters=12, lr=1.0, l2=0.0)
    w_reg = lm.train_logistic(df, dim=4, iters=12, lr=1.0, l2=0.5)
    assert np.linalg.norm(w_reg[:-1]) < np.linalg.norm(w_free[:-1])


def test_classifier_curation_e2e(spark, sf_dir):
    """End-to-end quality-classifier curation over REAL corpus
    features: hash-featurize documents (feature_hash_signed), label by
    a hidden lexical rule, train the distributed trainer, and the
    fitted model must recover the rule from hashed bag-of-words alone
    — the DCLM/FineWeb-style curation loop in one test."""
    from unstract_spark.operators import text_analysis as ta

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    labeled = docs.withColumn(
        "label", F.col("text").contains("spark").cast("int")
    )
    # both classes must exist or the fit is vacuous
    kinds = {r.label for r in labeled.select("label").distinct().collect()}
    assert kinds == {0, 1}
    dim = 256
    sparse = ta.feature_hash_signed(
        labeled.select("doc_id", "text"), n_buckets=dim
    )
    feats = lm.densify(sparse, dim).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    w = lm.train_logistic(feats, dim=dim, iters=60, lr=4.0)
    scored = lm.logistic_score(feats, w).select("label", "score").collect()
    acc = np.mean([(r.score > 0.5) == (r.label == 1) for r in scored])
    assert acc >= 0.9


def test_densify_fills_absent_buckets(spark):
    sparse = spark.createDataFrame(
        [(1, 0, 2.0), (1, 3, -1.0), (2, 1, 4.0)],
        "doc_id long, bucket int, feat double",
    )
    rows = {r.doc_id: r.features for r in lm.densify(sparse, 4).collect()}
    assert rows[1] == [2.0, 0.0, 0.0, -1.0]
    assert rows[2] == [0.0, 4.0, 0.0, 0.0]


def test_model_save_load_roundtrip(tmp_path, spark):
    w = np.array([0.1, -2.5e-17, 3.0, 7.25])
    p = str(tmp_path / "models" / "quality.json")
    lm.save_model(p, w, meta={"dim": 3, "rule": "contains spark"})
    w2, meta = lm.load_model(p)
    assert np.array_equal(w, w2)  # exact float round-trip via JSON repr
    assert meta["rule"] == "contains spark"
    # a loaded model scores identically to the in-memory one
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0],)], "features array<double>"
    )
    a = lm.logistic_score(df, w).collect()[0].score
    b = lm.logistic_score(df, w2).collect()[0].score
    assert a == b


def test_streaming_classifier_matches_batch(spark, tmp_path):
    """Union-of-fires == one-batch scoring (the streaming-twin gate),
    plus keep semantics against the model artifact."""
    from unstract_spark.streaming.incremental import (
        streaming_classifier_pipeline,
    )
    from unstract_spark.operators import text_analysis as ta

    dim = 32
    rng = np.random.RandomState(5)
    texts = [
        (i, " ".join(rng.choice(["alpha", "beta", "gamma", "spark", "x"], 12)))
        for i in range(60)
    ]
    corpus = spark.createDataFrame(texts, "doc_id long, text string")
    labeled = corpus.withColumn(
        "label", F.col("text").contains("spark").cast("int")
    )
    feats = lm.densify(
        ta.feature_hash_signed(corpus, n_buckets=dim), dim
    ).join(labeled.select("doc_id", "label"), "doc_id")
    w = lm.train_logistic(feats, dim=dim, iters=25, lr=2.0)
    model = str(tmp_path / "model.json")
    lm.save_model(model, w, meta={"dim": dim})

    src = str(tmp_path / "src")
    # two drops -> two fires
    corpus.filter("doc_id < 30").coalesce(1).write.mode("append").parquet(src)
    streaming_classifier_pipeline(
        spark, src, str(tmp_path / "ck"), str(tmp_path / "out"), model, dim
    )
    corpus.filter("doc_id >= 30").coalesce(1).write.mode("append").parquet(src)
    total = streaming_classifier_pipeline(
        spark, src, str(tmp_path / "ck"), str(tmp_path / "out"), model, dim
    )
    assert total >= 1

    streamed = {
        r.doc_id: (round(r.score, 9), r.keep)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = {
        r.doc_id: (round(r.score, 9), r.score > 0.5)
        for r in lm.logistic_score(
            lm.densify(ta.feature_hash_signed(corpus, n_buckets=dim), dim), w
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) == 60


def test_streaming_classifier_dim_mismatch_raises(spark, tmp_path):
    from unstract_spark.streaming.incremental import (
        streaming_classifier_pipeline,
    )

    model = str(tmp_path / "m.json")
    lm.save_model(model, np.zeros(5))
    with pytest.raises(ValueError):
        streaming_classifier_pipeline(
            spark, str(tmp_path / "s"), str(tmp_path / "c"),
            str(tmp_path / "o"), model, dim=16,
        )
