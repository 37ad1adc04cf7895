"""IVF (inverted-file) approximate nearest neighbours.

Index: k-means centroids trained driver-side on a bounded sample (numpy
Lloyd iterations, deterministic seed), broadcast; every corpus vector is
assigned to its nearest centroid by a vectorized pandas UDF (one matmul per
Arrow batch).  Search: each query probes its ``nprobe`` nearest centroids
and reranks only the vectors in those lists with the exact cosine — the
candidate set shrinks from N to ~N·nprobe/n_centroids, and the probe join
is a plain equi-join on centroid id (shuffle on a small bounded key space,
AQE-coalesced).  ``nprobe == n_centroids`` degenerates to exact brute force
(tested as an identity against :func:`brute_force_topk`).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ner_spark.similarity.ann import _cosine


def train_centroids(corpus: DataFrame, n_centroids: int = 16,
                    n_iter: int = 10, sample_size: int = 4096,
                    seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> np.ndarray:
    """Driver-side Lloyd k-means over a seeded Bernoulli sample — no
    global sort: ``count()`` is a parquet-metadata scan, ``sample`` is a
    narrow per-partition filter (2× oversample then cap covers sampling
    variance)."""
    n = corpus.count()
    if n > sample_size:
        fraction = min(1.0, 2.0 * sample_size / n)
        sampled = corpus.select(vec_col).sample(fraction=fraction, seed=seed) \
                        .limit(sample_size)
    else:
        sampled = corpus.select(vec_col)
    sample = sampled.collect()
    X = np.asarray([r[0] for r in sample], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(n_iter):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def assign_centroids(df: DataFrame, centroids: np.ndarray,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     out_col: str = "centroid",
                     n_nearest: int = 1) -> DataFrame:
    """(id, centroid) — nearest centroid per vector (or ``n_nearest`` rows
    per vector for query probing), one matmul per Arrow batch."""
    src = df.select(id_col, vec_col)
    cent = centroids  # captured; broadcast via task closure (small)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
            d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            if n_nearest == 1:
                yield pd.DataFrame({id_col: pdf[id_col],
                                    out_col: d.argmin(axis=1)})
            else:
                top = np.argsort(d, axis=1)[:, :n_nearest]
                ids = np.repeat(np.asarray(pdf[id_col]), top.shape[1])
                yield pd.DataFrame({id_col: ids, out_col: top.ravel()})

    return src.mapInPandas(fn, schema=f"{id_col} long, {out_col} int")


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4, n_iter: int = 10,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: np.ndarray | None = None) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) over the probed lists only.

    ``centroids`` overrides the sample-trained index — pass e.g.
    ``similarity.kmeans.kmeans_fit(corpus, k)`` for a full-corpus-trained
    IVF (equality of the two trainers on a well-separated corpus is
    exercised in tests/test_kmeans.py / tests/test_ivf.py)."""
    cent = centroids if centroids is not None else train_centroids(
        corpus, n_centroids, n_iter, seed=seed,
        id_col=id_col, vec_col=vec_col)
    corpus_assign = assign_centroids(corpus, cent, id_col, vec_col) \
        .withColumnRenamed(id_col, "neighbor_id")
    query_probes = assign_centroids(queries, cent, id_col, vec_col,
                                    n_nearest=min(nprobe, len(cent))) \
        .withColumnRenamed(id_col, "query_id")
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    cand = (
        query_probes.join(corpus_assign, "centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
        .join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
