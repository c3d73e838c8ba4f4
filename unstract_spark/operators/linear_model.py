"""Distributed linear-model TRAINING — the quality-classifier fit step.

The engine already SCORES documents with fixed-weight logistic filters
(the `ex_*` curation rows); this module closes the loop by FITTING
those weights on a labeled corpus, the way the public data-curation
recipes do (DCLM / FineWeb-Edu style: label a seed set, train a small
linear classifier over cheap text features, score the whole corpus,
keep the top fraction).  Reference parity note: Zipstack/unstract has
no in-engine trainer — classification there is LLM-prompted
(`prompt-service`; see operators/enrich.py:139 for that operator) —
so this is part of the training-data-pipeline surface the build brief
adds on top of reference coverage.

Scale shape (the only part that matters at 100 TB):

- The model is TINY (dim+1 doubles) and the data is huge, so every
  iteration is: broadcast weights down as a literal array -> one
  narrow scan computing the per-row margin natively (F.aggregate
  zip_with dot product — whole-stage codegen, no Python) -> posexplode
  the feature vector ONLY to partial-sum the gradient per position.
  The shuffle per iteration is ~tasks x dim rows after map-side
  combine; only dim+1 sums ever reach the driver (the Lloyd
  discipline, similarity.py:kmeans_refine).
- The feature frame is localCheckpoint'ed once up front: iterations
  re-scan materialized columnar batches, not the lineage.
- No per-row Python anywhere: sigmoid/clip/dot are Spark expressions;
  numpy touches only the (dim+1)-sized aggregates.

Determinism: double partial-sum merge order is not fixed across runs,
so fitted weights are reproducible only to float tolerance — this
module is pytest-gated (loss monotonicity, separable-data accuracy,
agreement with an in-driver numpy reference), not oracle-gated, the
HNSW precedent."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot_expr(features_col: str, w: np.ndarray, bias: float):
    """Native dot(features, w) + bias as one codegen expression."""
    warr = F.array(*[F.lit(float(v)) for v in w])
    return (
        F.aggregate(
            F.zip_with(
                F.col(features_col).cast("array<double>"),
                warr,
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        + F.lit(float(bias))
    )


def logistic_score(
    df: DataFrame,
    weights: np.ndarray,
    features_col: str = "features",
    out: str = "score",
) -> DataFrame:
    """Score rows with a fitted model: sigmoid(w . x + b), all native.

    `weights` is the (dim+1,) vector train_logistic returns (bias
    last).  The corpus-wide scoring pass is a projection — no shuffle,
    no Python; this is the 100 TB-side half of the classifier."""
    w = np.asarray(weights, dtype=np.float64)
    z = _dot_expr(features_col, w[:-1], float(w[-1]))
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def train_logistic(
    df: DataFrame,
    dim: int,
    features_col: str = "features",
    label_col: str = "label",
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
    return_history: bool = False,
):
    """Fit logistic regression by full-batch gradient descent.

    Each iteration runs ONE job over the (checkpointed) training
    frame:

        margin  = w . x + b                      (native dot)
        p       = sigmoid(margin)                (native)
        resid   = p - y                          (native)
        grad[j] = sum(resid * x[j])              (posexplode + sum,
                                                  map-side combined)
        gradb   = sum(resid); loss = sum(logloss); n = count

    posexplode emits dim rows per training row, but they never leave
    the map side un-aggregated: partial aggregation collapses them to
    (tasks x dim) before the exchange, and the driver receives exactly
    dim rows for the gradient plus one scalar row — model size, not
    data size.  The learning rate is normalized by n (so `lr` is scale
    free) and weights update driver-side in numpy.

    log-loss uses the numerically-safe spelling
    ln(1+exp(-|z|)) + max(z,0) - z*y, clipped implicitly by the abs —
    no overflow at any margin.

    Returns the (dim+1,) weight vector (bias last); with
    `return_history`, also the per-iteration mean log-loss list (a
    training curve the caller can assert decreases)."""
    feats = (
        df.select(
            F.col(features_col).cast("array<double>").alias("x"),
            F.col(label_col).cast("double").alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    n = feats.count()
    if n == 0:
        raise ValueError("empty training frame")
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    history: list[float] = []
    for _ in range(max(iters, 0)):
        z = _dot_expr("x", w, b)
        scored = feats.select(
            "x",
            "y",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("p"),
            z.alias("z"),
        )
        # loss = softplus(-|z|) + max(z,0) - z*y  (safe logloss)
        loss_row = scored.agg(
            F.sum(
                F.log(F.lit(1.0) + F.exp(-F.abs(F.col("z"))))
                + F.greatest(F.col("z"), F.lit(0.0))
                - F.col("z") * F.col("y")
            ).alias("loss"),
            F.sum(F.col("p") - F.col("y")).alias("gb"),
        ).collect()[0]
        grad_rows = (
            scored.select(
                (F.col("p") - F.col("y")).alias("r"),
                F.posexplode("x").alias("pos", "v"),
            )
            .groupBy("pos")
            .agg(F.sum(F.col("r") * F.col("v")).alias("g"))
            .collect()
        )
        grad = np.zeros(dim, dtype=np.float64)
        for r in grad_rows:
            grad[r.pos] = r.g
        w -= lr * (grad / n + l2 * w)
        b -= lr * float(loss_row.gb) / n
        history.append(float(loss_row.loss) / n)
    weights = np.concatenate([w, [b]])
    return (weights, history) if return_history else weights


def densify(
    sparse: DataFrame,
    dim: int,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    feat_col: str = "feat",
    out: str = "features",
) -> DataFrame:
    """(id, bucket, feat) sparse rows -> one dense array<double> row
    per id — the adapter between text_analysis.feature_hash_signed and
    the trainer/scorer.  All native: collect the (bucket, value) pairs
    into a map per id, then one `transform(sequence(...))` projection
    fills absent buckets with 0.0.  The shuffle keys on id (one row
    per document afterward); dense width is the model dim, bounded by
    construction, so row size is fixed — the shape that survives any
    corpus scale."""
    m = F.map_from_entries(
        F.collect_list(
            F.struct(
                F.col(bucket_col).cast("int").alias("k"),
                F.col(feat_col).cast("double").alias("v"),
            )
        )
    )
    g = sparse.groupBy(id_col).agg(m.alias("_m"))
    return g.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            # try_element_at: map lookup by KEY, NULL (not an ANSI
            # error) when the bucket is absent
            lambda i: F.coalesce(
                F.try_element_at(F.col("_m"), i), F.lit(0.0)
            ),
        ).alias(out),
    )


def save_model(
    path: str,
    weights: np.ndarray,
    meta: dict | None = None,
) -> None:
    """Persist a fitted classifier as one JSON artifact (the
    save_tokenizer convention: tmp-write + atomic os.replace publish).
    Training is corpus-wide and expensive; scoring runs inside every
    curation job — the artifact crosses that boundary.  `meta` carries
    whatever the fit pipeline wants auditable (feature dim, n_buckets,
    label rule, training corpus id); full float precision via repr."""
    import json
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "version": 1,
        "weights": [float(v) for v in np.asarray(weights, dtype=np.float64)],
        "meta": meta or {},
    }
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def load_model(path: str) -> tuple[np.ndarray, dict]:
    """(weights, meta) — inverse of save_model."""
    import json

    with open(path) as f:
        payload = json.load(f)
    return np.asarray(payload["weights"], dtype=np.float64), payload.get(
        "meta", {}
    )


def train_logistic_reference(
    x: np.ndarray,
    y: np.ndarray,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
) -> np.ndarray:
    """In-driver numpy twin of train_logistic (same math, same
    schedule) — the agreement gate for the distributed path."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, dim = x.shape
    w = np.zeros(dim)
    b = 0.0
    for _ in range(max(iters, 0)):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        w -= lr * ((x.T @ (p - y)) / n + l2 * w)
        b -= lr * float(np.sum(p - y)) / n
    return np.concatenate([w, [b]])
