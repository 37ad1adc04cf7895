"""Distributed Lloyd k-means over an ``array<float>`` embedding column —
the document-clustering primitive of a curation pipeline, and the
full-corpus trainer behind IVF (``ivf.train_centroids`` is the bounded-
sample variant for index builds).

Per iteration: centroids ride a broadcast into a vectorized pandas UDF
(one matmul per Arrow batch) that emits PER-PARTITION partial sums — at
most ``k`` rows per task, each ``(cluster, count, vector-sum)`` — and the
k × n_partitions partial rows reduce on the driver with one numpy sum.
The corpus is scanned once per iteration, never shuffled; driver state is
O(k·dim).  That is the canonical scale shape for Lloyd on 10⁹+ vectors.

Init is deterministic WITHOUT a pass over the data ordering: the k
vectors with the smallest ids (one bounded sort-limit on (id, vec)).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial_sums(df: DataFrame, cent: np.ndarray, id_col: str,
                  vec_col: str) -> pd.DataFrame:
    """One corpus scan → pandas frame of (cluster, cnt, vsum) partials."""
    C = cent.astype(np.float64)
    src = df.select(vec_col)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.stack(pdf[vec_col].map(np.asarray).to_list()) \
                  .astype(np.float64)
            # squared euclidean via the expansion; argmin ties → lowest id
            d = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) \
                + (C * C).sum(1)[None, :]
            assign = d.argmin(axis=1)
            rows = []
            for c in np.unique(assign):
                m = X[assign == c]
                rows.append((int(c), len(m), m.sum(axis=0).tolist()))
            yield pd.DataFrame(rows, columns=["cluster", "cnt", "vsum"])

    out = src.mapInPandas(
        fn, schema="cluster int, cnt long, vsum array<double>")
    return out.toPandas()  # ≤ k × n_partitions rows


def kmeans_fit(corpus: DataFrame, k: int = 8, n_iter: int = 5,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> np.ndarray:
    """→ (k, dim) centroids after ``n_iter`` Lloyd iterations over the
    FULL corpus.  Empty clusters keep their previous centroid (standard
    Lloyd degeneracy handling; deterministic)."""
    seed_rows = (corpus.select(id_col, vec_col)
                 .orderBy(id_col).limit(k).collect())
    cent = np.asarray([list(r[1]) for r in seed_rows], dtype=np.float64)
    for _ in range(n_iter):
        part = _partial_sums(corpus, cent, id_col, vec_col)
        new = cent.copy()
        for c, grp in part.groupby("cluster"):
            total = grp["cnt"].sum()
            if total:
                vs = np.sum(np.stack(grp["vsum"].map(np.asarray).to_list()),
                            axis=0)
                new[int(c)] = vs / total
        cent = new
    return cent


def kmeans_assign(corpus: DataFrame, cent: np.ndarray,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, cluster, dist) — nearest centroid per vector (euclidean;
    ties → lowest cluster id), one matmul per Arrow batch."""
    C = cent.astype(np.float64)
    src = corpus.select(id_col, vec_col)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.stack(pdf[vec_col].map(np.asarray).to_list()) \
                  .astype(np.float64)
            d = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) \
                + (C * C).sum(1)[None, :]
            assign = d.argmin(axis=1)
            dist = np.sqrt(np.maximum(d[np.arange(len(X)), assign], 0.0))
            yield pd.DataFrame({id_col: pdf[id_col],
                                "cluster": assign.astype(np.int32),
                                "dist": np.round(dist, 6)})

    return src.mapInPandas(
        fn, schema=f"{id_col} long, cluster int, dist double")
