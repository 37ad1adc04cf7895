"""Cross-document boilerplate removal (the CCNet/C4 curation stage):
segments that recur in a large fraction of the corpus — nav bars, cookie
banners, license footers — are dropped from every document.

Segmentation is pluggable: ``mode='lines'`` splits on newline runs (the
classic C4 line filter); ``mode='token_chunks'`` uses fixed ``n_tokens``
word windows (the unit that still exists when upstream extraction already
flattened whitespace, as in the synthetic corpus).

Plan shape for 100 TB: the corpus is NEVER shuffled.  Per-doc distinct
segments explode into the ONLY real shuffle — a map-side-combinable
count per segment — then two one-row/tiny broadcasts come back: the
corpus doc total (for the fractional threshold, computed in-plan, no
driver action) and the frequent-segment set (bounded by construction:
a segment needs >= frac·N docs, so there are at most 1/frac·(segments
per doc) of them).  Removal is a higher-order ``filter`` against the
broadcast array — order- and duplicate-preserving, whole text column
stays put in its scan partitions.  If the frequent set ever outgrew a
broadcast (pathological frac), the fallback is explode + broadcast
left-anti + ordered reassemble, at the price of one corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segments_col(text_col: str, mode: str = "token_chunks",
                 n_tokens: int = 2) -> Column:
    """Ordered segment array for one document (duplicates kept)."""
    if mode == "lines":
        return F.split(F.col(text_col), r"\n+")
    if mode == "token_chunks":
        toks = F.split(F.col(text_col), r"\s+")
        idx = F.sequence(F.lit(1), F.size(toks), F.lit(n_tokens))
        return F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, n_tokens), " "))
    raise ValueError(f"unknown segmentation mode: {mode}")


def boilerplate_segments(df: DataFrame, text_col: str = "text",
                         mode: str = "token_chunks", n_tokens: int = 2,
                         min_doc_frac: float = 0.05) -> DataFrame:
    """(seg, n_docs) for every segment present in >= ceil(frac·N) docs.

    ``n_docs`` counts DOCUMENTS (within-doc repeats collapse via
    ``array_distinct`` before the explode — no distinct-agg shuffle).
    The doc total joins in as a broadcast one-row aggregate, so building
    this plan runs zero Spark jobs."""
    occ = df.select(
        F.explode(F.array_distinct(segments_col(text_col, mode, n_tokens)))
        .alias("seg"))
    counts = occ.groupBy("seg").agg(F.count(F.lit(1)).alias("n_docs"))
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (counts.join(F.broadcast(total))
            .where(F.col("n_docs")
                   >= F.ceil(F.lit(min_doc_frac) * F.col("_total")))
            .select("seg", "n_docs"))


def remove_boilerplate(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       mode: str = "token_chunks", n_tokens: int = 2,
                       min_doc_frac: float = 0.05) -> DataFrame:
    """Per-document scrub: (id, n_seg, n_removed, clean_text).

    ``clean_text`` re-joins the surviving segments in original order,
    duplicates preserved (only segments in the frequent SET are dropped —
    a doc-local repeat of a rare segment survives both copies)."""
    fset = (boilerplate_segments(df, text_col, mode, n_tokens, min_doc_frac)
            .agg(F.collect_list("seg").alias("_fset")))
    joiner = " " if mode == "token_chunks" else "\n"
    segs = segments_col(text_col, mode, n_tokens)
    return (df.withColumn("_segs", segs)
            .join(F.broadcast(fset))
            .withColumn("_kept", F.filter(
                "_segs", lambda x: ~F.array_contains(F.col("_fset"), x)))
            .select(
                F.col(id_col),
                F.size("_segs").cast("long").alias("n_seg"),
                (F.size("_segs") - F.size("_kept")).cast("long")
                .alias("n_removed"),
                F.array_join("_kept", joiner).alias("clean_text")))
