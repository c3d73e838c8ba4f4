"""dedup.embedding_neardup_lsh: the LSH-bucketed scale path for
embedding-cosine near-dup (the oracle is the all-pairs twin)."""

from __future__ import annotations

import numpy as np

from unstract_spark.operators import dedup


def _corpus(spark, n_clusters=4, per_cluster=6, dim=16, seed=3):
    """Clustered unit vectors: members of a cluster are tiny
    perturbations of its center (cosine ~1), cross-cluster cosine ~0."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + rng.normal(scale=0.01, size=dim)
            rows.append((vid, [float(x) for x in (v / np.linalg.norm(v))]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_pairs_are_subset_of_exact_with_identical_cosines(spark):
    e = _corpus(spark)
    exact = {
        (r.id_a, r.id_b): round(r.cosine, 6)
        for r in dedup.embedding_neardup_pairs(e, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b): round(r.cosine, 6)
        for r in dedup.embedding_neardup_lsh(
            e, threshold=0.9, dim=16, n_planes=4, n_tables=4
        ).collect()
    }
    assert lsh, "LSH path found no pairs on a clustered corpus"
    assert set(lsh) <= set(exact)
    for p, c in lsh.items():
        assert c == exact[p]  # exact re-check, not an estimate


def test_lsh_recall_is_high_on_tight_clusters(spark):
    # near-identical vectors agree on every sign bit with overwhelming
    # probability, so tight clusters should be recovered almost fully
    e = _corpus(spark, per_cluster=4)
    exact = {(r.id_a, r.id_b) for r in dedup.embedding_neardup_pairs(e, threshold=0.99).collect()}
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_lsh(
            e, threshold=0.99, dim=16, n_planes=4, n_tables=4
        ).collect()
    }
    assert len(lsh) >= 0.8 * len(exact)


def test_forced_pandas_path_matches_sql_path(spark):
    e = _corpus(spark)
    kw = dict(threshold=0.9, dim=16, n_planes=4, n_tables=4)
    sql_rows = {
        (r.id_a, r.id_b, round(r.cosine, 6))
        for r in dedup.embedding_neardup_lsh(e, **kw).collect()
    }
    udf_rows = {
        (r.id_a, r.id_b, round(r.cosine, 6))
        for r in dedup.embedding_neardup_lsh(e, term_limit=0, **kw).collect()
    }
    assert sql_rows == udf_rows


def test_max_bucket_guard_drops_degenerate_cluster(spark):
    # one giant near-constant cluster would dominate candidate pairs;
    # the guard drops its buckets entirely (quadratic blowup fuse)
    big = _corpus(spark, n_clusters=1, per_cluster=20, seed=5)
    n_unguarded = dedup.embedding_neardup_lsh(
        big, threshold=0.5, dim=16, n_planes=2, n_tables=1
    ).count()
    n_guarded = dedup.embedding_neardup_lsh(
        big, threshold=0.5, dim=16, n_planes=2, n_tables=1, max_bucket=10
    ).count()
    assert n_unguarded > 0
    assert n_guarded == 0


def test_auto_lsh_params_scale_with_corpus():
    """The sf1-rung lesson: fixed-width buckets densify linearly and
    the candidate join grows quadratically.  auto params must grow
    planes ~log2(n) (holding expected occupancy near target_bucket)
    and buy recall back with tables."""
    p_small, t_small = dedup.auto_lsh_params(2_000, threshold=0.35)
    p_big, t_big = dedup.auto_lsh_params(20_000, threshold=0.35)
    p_huge, t_huge = dedup.auto_lsh_params(2_000_000_000, threshold=0.35)
    # planes grow with log2(n): +~3.3 bits per 10x
    assert p_big - p_small >= 3
    assert p_huge > p_big
    # expected occupancy n / 2^planes stays bounded near the target
    for n, p in [(2_000, p_small), (20_000, p_big), (2_000_000_000, p_huge)]:
        assert n / (1 << p) <= 64
    # recall is bought back with more tables as planes sharpen
    assert t_big >= t_small
    assert 1 <= t_huge <= 64
    # degenerate corpora don't explode
    assert dedup.auto_lsh_params(0, 0.9) == (1, 1)
    assert dedup.auto_lsh_params(10, 0.999999) [1] >= 1


def test_auto_mode_keeps_recall_on_clusters(spark):
    e = _corpus(spark, n_clusters=6, per_cluster=8)
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_pairs(e, threshold=0.9).collect()
    }
    auto = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_lsh(
            e, threshold=0.9, dim=16, n_planes="auto"
        ).collect()
    }
    assert auto <= exact
    # tight clusters (cosine ~1): collision probability per table is
    # near 1, so auto mode must recover nearly everything
    assert len(auto) >= 0.9 * len(exact)
