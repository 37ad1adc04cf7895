"""Distributed Lloyd k-means vs an exact numpy oracle (same init rule)."""

from __future__ import annotations

import numpy as np
import pytest


def _embeddings(spark, n=300, dim=8, seed=5):
    rng = np.random.RandomState(seed)
    X = rng.normal(size=(n, dim))
    # three planted blobs so clustering is non-trivial but stable
    X[:100] += 6.0
    X[100:200] -= 6.0
    rows = [(i, X[i].tolist()) for i in range(n)]
    return (spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            X)


def _numpy_lloyd(X, k, n_iter):
    cent = X[:k].astype(np.float64).copy()  # same init: k smallest ids
    for _ in range(n_iter):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = X[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return cent


@pytest.mark.parametrize("k,n_iter", [(3, 1), (3, 4), (6, 3)])
def test_kmeans_fit_matches_numpy(spark, k, n_iter):
    from ner_spark.similarity.kmeans import kmeans_assign, kmeans_fit

    df, X = _embeddings(spark)
    cent = kmeans_fit(df, k=k, n_iter=n_iter)
    want = _numpy_lloyd(X, k, n_iter)
    # partial-sum order differs from numpy's single sum → allclose,
    # not equality; assignments must agree exactly (no boundary ties in
    # this fixture)
    assert np.allclose(cent, want, atol=1e-8)

    got = {r.vec_id: r.cluster
           for r in kmeans_assign(df, cent).collect()}
    d = ((X[:, None, :] - want[None, :, :]) ** 2).sum(axis=2)
    expect = d.argmin(axis=1)
    assert got == {i: int(expect[i]) for i in range(len(X))}


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from ner_spark.similarity.kmeans import kmeans_fit

    # two identical points far from the third seed → seed 2's cluster
    # goes empty after iteration 1 and must keep its previous centroid
    rows = [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.05, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = kmeans_fit(df, k=2, n_iter=3)
    assert cent.shape == (2, 2)
    assert np.isfinite(cent).all()


def test_ivf_with_kmeans_centroids_full_probe_is_exact(spark):
    """IVF accepts externally trained centroids; at nprobe == k it is
    exactly brute force regardless of the trainer."""
    from ner_spark.similarity.ann import brute_force_topk
    from ner_spark.similarity.ivf import ivf_topk
    from ner_spark.similarity.kmeans import kmeans_fit

    df, _ = _embeddings(spark, n=120)
    cent = kmeans_fit(df, k=4, n_iter=2)
    q = df.filter("vec_id < 5")
    got = sorted(map(tuple, ivf_topk(df, q, k=3, nprobe=4,
                                     centroids=cent).collect()))
    want = sorted(map(tuple, brute_force_topk(df, q, k=3).collect()))
    assert got == want
