"""IVF ANN: full-probe identity with brute force, partial-probe subset +
recall sanity, deterministic centroids."""

import numpy as np
import pytest

from ner_spark.similarity.ann import brute_force_topk
from ner_spark.similarity.ivf import assign_centroids, ivf_topk, train_centroids

N, DIM = 80, 12


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(3)
    # clustered data so IVF has structure to exploit
    centers = rng.normal(scale=4, size=(6, DIM))
    vecs = [centers[i % 6] + rng.normal(size=DIM) for i in range(N)]
    return spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")


def _rows(df):
    return {(r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in df.collect()}


def test_full_probe_equals_brute_force(spark, emb_df):
    queries = emb_df.filter("vec_id < 5")
    exact = _rows(brute_force_topk(emb_df, queries, k=4))
    full = _rows(ivf_topk(emb_df, queries, k=4, n_centroids=8, nprobe=8))
    assert full == exact


def test_partial_probe_subset_and_recall(spark, emb_df):
    queries = emb_df.filter("vec_id < 8")
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb_df, queries, k=3).collect()}
    approx_df = ivf_topk(emb_df, queries, k=3, n_centroids=8, nprobe=3)
    approx = {(r.query_id, r.neighbor_id) for r in approx_df.collect()}
    # cosines must be exact for whatever it returns
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # clustered data + 3/8 probes
    # per-query at most k rows, ranks contiguous from 1
    by_q = {}
    for r in approx_df.collect():
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_centroids_deterministic_and_assignment(spark, emb_df):
    c1 = train_centroids(emb_df, n_centroids=8, seed=7)
    c2 = train_centroids(emb_df, n_centroids=8, seed=7)
    assert np.allclose(c1, c2)
    a = {r.vec_id: r.centroid
         for r in assign_centroids(emb_df, c1).collect()}
    assert len(a) == N and all(0 <= v < 8 for v in a.values())
    # assignment is the numpy argmin
    vecs = {r.vec_id: np.asarray(r.embedding)
            for r in emb_df.collect()}
    for i in (0, 17, 42):
        d = ((vecs[i][None, :] - c1) ** 2).sum(axis=1)
        assert a[i] == int(d.argmin())
