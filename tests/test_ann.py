"""Similarity search: brute-force cosine top-k vs a numpy oracle; LSH
bucketed variant returns exact cosines for its (reduced) candidate set."""

import numpy as np
import pytest

from ner_spark.similarity.ann import brute_force_topk, hyperplane_buckets, lsh_topk

DIM = 16
N = 60


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(11)
    return rng.normal(size=(N, DIM)).astype(np.float64)


@pytest.fixture(scope="module")
def emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<double>")


def _numpy_topk(vecs, qids, k):
    out = {}
    norms = np.linalg.norm(vecs, axis=1)
    for q in qids:
        cos = (vecs @ vecs[q]) / (norms * norms[q])
        cand = [(round(float(cos[j]), 6), j) for j in range(N) if j != q]
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[q] = cand[:k]
    return out


def test_brute_force_matches_numpy(emb_df, vecs):
    qids = [0, 1, 2, 3]
    got = brute_force_topk(emb_df, emb_df.filter(f"vec_id < {len(qids)}"), k=5) \
        .collect()
    want = _numpy_topk(vecs, qids, 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    for q in qids:
        rows = sorted(by_q[q])
        assert [(nid, cos) for _, nid, cos in rows] == \
            [(j, c) for c, j in want[q]]


def test_lsh_buckets_deterministic(emb_df):
    b1 = {r.vec_id: r.bucket for r in hyperplane_buckets(emb_df, bits=6).collect()}
    b2 = {r.vec_id: r.bucket for r in hyperplane_buckets(emb_df, bits=6).collect()}
    assert b1 == b2
    assert all(0 <= v < 64 for v in b1.values())


def test_lsh_topk_subset_of_bruteforce_cosines(emb_df, vecs):
    """LSH results carry exact cosines and each neighbour shares the query's
    bucket — recall < 1 by design, correctness of scores exact."""
    got = lsh_topk(emb_df, emb_df.filter("vec_id < 4"), k=5, bits=4).collect()
    norms = np.linalg.norm(vecs, axis=1)
    assert got
    for r in got:
        cos = float(vecs[r.query_id] @ vecs[r.neighbor_id]
                    / (norms[r.query_id] * norms[r.neighbor_id]))
        assert r.cosine == pytest.approx(round(cos, 6), abs=1e-6)


def test_block_gemm_near_dups_exact_vs_numpy(emb_df, vecs):
    """Distributed block GEMM must equal the numpy all-pairs product for
    every block count (1 block = single GEMM; 8 > sqrt(N) exercises the
    cross-block emit on both triangles)."""
    from ner_spark.similarity.ann import embedding_near_dups

    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = np.round((vecs / norms) @ (vecs / norms).T, 6)
    thr = 0.3
    want = {(i, j): cos[i, j] for i in range(N) for j in range(i + 1, N)
            if cos[i, j] >= thr}
    for nb in (1, 3, 8):
        got = {(r.id1, r.id2): r.cosine
               for r in embedding_near_dups(emb_df, threshold=thr,
                                            n_blocks=nb).collect()}
        assert got.keys() == want.keys(), f"n_blocks={nb}"
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-6)
