"""End-to-end corpus curation: the composed keep/drop verdict an LLM
training-data pipeline applies before packing.

Stages (each individually oracle-checked as its own driver query):

  1. quality gates   — token-count bounds, stopword floor, alpha floor
                       (`analysis.quality_score`; query `quality_filter`);
  2. near-dup dedup  — LSH candidates → exact-verify pairs → connected
                       components → canonical keeper
                       (`dedup.dedup_clusters`; query `dedup_clusters`);
  3. decontamination — word-n-gram collision with a benchmark set
                       (`decontaminate.contamination_flags`;
                       query `decontaminate`).

Output: every input document with its per-stage booleans and the final
``keep`` verdict — auditable drop reasons, the operational contract of a
curation run.  The expensive signals are computed on the FULL corpus
(dedup must see duplicates even among quality-rejects: dropping a
quality-reject must not promote its near-dup twin to "kept original" —
canonical selection is defined on the full graph, then intersected with
the quality/contamination gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import quality_score
from .decontaminate import contamination_flags
from .dedup import dedup_clusters


def curate(docs: DataFrame, benchmark: DataFrame,
           min_tokens: int = 20, max_tokens: int = 100_000,
           min_stopword_ratio: float = 0.01, min_alpha_ratio: float = 0.6,
           dedup_threshold: float = 0.5, decontam_n: int = 4,
           block_col: str | None = "source",
           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_tokens, quality_ok, canonical_id, is_canonical,
    contaminated, keep) for EVERY input document."""
    q = quality_score(docs, id_col=id_col, text_col=text_col).select(
        id_col, "n_tokens",
        (F.col("n_tokens").between(min_tokens, max_tokens)
         & (F.col("stopword_ratio") >= min_stopword_ratio)
         & (F.col("alpha_ratio") >= min_alpha_ratio)).alias("quality_ok"))

    d = dedup_clusters(docs, block_col=block_col, threshold=dedup_threshold,
                       id_col=id_col, text_col=text_col) \
        .select(F.col("doc_id").alias(id_col), "canonical_id",
                F.col("is_kept").alias("is_canonical"))

    c = contamination_flags(docs, benchmark, n=decontam_n,
                            id_col=id_col, text_col=text_col) \
        .select(id_col, "contaminated")

    out = (q.join(d, id_col).join(c, id_col)
            .withColumn("keep", F.col("quality_ok") & F.col("is_canonical")
                        & ~F.col("contaminated")))
    return out.select(id_col, "n_tokens", "quality_ok", "canonical_id",
                      "is_canonical", "contaminated", "keep")
