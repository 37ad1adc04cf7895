"""Benchmark decontamination: flag training documents that share word
n-grams with a benchmark/eval set (the standard 8-13-gram collision test
used before LLM pretraining).

Plan shape for 100 TB: the benchmark side is tiny (eval suites are
thousands of documents) — its distinct shingle set broadcasts; the corpus
side explodes to (doc, shingle) and hits are a broadcast hash semi-join +
per-doc count, so the corpus is never shuffled and the scan stays narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ner_spark.textops.analysis import tokens_col


def _shingles(text_col: str, n: int):
    toks = tokens_col(text_col)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n))))


def contamination_flags(corpus: DataFrame, benchmark: DataFrame,
                        n: int = 8, threshold: float = 0.0,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, n_shingles, n_hits, ratio, contaminated) per corpus doc.

    ``contaminated`` = n_hits > threshold·n_shingles (default: any hit).
    Exact — no hashing, shingle strings joined directly (the broadcast
    side is the small one, so string width costs nothing at scale)."""
    bench = benchmark.select(
        F.explode(_shingles(text_col, n)).alias("s")).distinct()
    docs = corpus.select(F.col(id_col),
                         _shingles(text_col, n).alias("sh"))
    sizes = docs.select(id_col, F.size("sh").alias("n_shingles"))
    ex = docs.select(id_col, F.explode("sh").alias("s"))
    hits = (ex.join(F.broadcast(bench), "s")
              .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits")))
    out = (sizes.join(hits, id_col, "left")
           .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
           .withColumn("ratio", F.round(
               F.col("n_hits") / F.greatest("n_shingles", F.lit(1)), 6)))
    return out.withColumn(
        "contaminated",
        F.col("n_hits") > F.lit(threshold) * F.col("n_shingles"))
