"""In-corpus unigram-LM cross-entropy scoring — the CCNet / DataComp-LM
quality device (score each document by how surprising its tokens are
under a language model) without CCNet's external wiki-trained KenLM:
the LM is trained on the corpus itself, so self-perplexity flags the
statistical outliers (gibberish, boilerplate walls, non-prose token
salad) the same way CCNet's perplexity buckets do, and the Spark
plumbing — train counts, broadcast the model, score per token — is the
identical shape a KenLM-backed scorer would use.

Exactness (the DuckDB oracle hash-matches): the one transcendental
(``ln``) is evaluated once per vocabulary TYPE on identical double
inputs in both engines and immediately quantized to integer micro-nats,
so every per-document aggregate is an exact long sum — order-
independent, hence immune to the float-summation-order divergence that
makes naive ``avg(double)`` oracles flaky.  Known theoretical bound:
JVM ``Math.log`` and DuckDB's libm ``log`` are each ≤1 ulp but not
guaranteed bit-identical, so a per-type NLL landing within ~1 ulp of a
micro-nat .5 boundary COULD quantize differently across engines
(probability ~1e-11 per type; with 10³-10⁴ types the oracle's false-
mismatch risk is ~1e-7 — accepted and, unlike a float-sum divergence,
it would surface as a loud isolated hash mismatch, not silent drift).

Scale shape: the vocabulary is capped at the ``top_k`` most frequent
types (lexicographic tie-break) with a single ``<unk>`` type absorbing
the tail — classic LM practice, and what keeps the broadcast model
bounded at web scale (the open vocabulary of 100 TB of text is not
broadcastable; top-k is chosen via TakeOrdered, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unats(num: Column, den: Column) -> Column:
    """Add-one-smoothed NLL in integer micro-nats: round(-ln(num/den)*1e6).
    num < den always (count+1 ≤ total < denominator), so the value is
    positive and Spark/DuckDB half-up rounding agree."""
    return F.round(-F.log(num.cast("double") / den.cast("double"))
                   * 1e6).cast("long")


def unigram_lm_scores(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      top_k: int = 4096) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy): mean add-one-smoothed unigram
    NLL per token (nats, 4 decimals), vocabulary = ``top_k`` most
    frequent lowercased whitespace tokens + ``<unk>`` for the tail.
    Zero-token documents are absent (no tokens to score).

    Plan: explode (narrow) → vocab count agg (shuffle 1, map-side
    combined) → TakeOrdered top-k → vocabulary-sized broadcast LM join +
    one-row broadcast constants → per-doc agg (shuffle 2).  The corpus
    text itself is never shuffled, and is scanned exactly twice (train,
    score): the vocabulary count table is ``persist()``-ed because three
    plan branches read it (top-k, total-mass, kept-mass) — without the
    cache each branch re-runs the corpus scan + count shuffle.  The
    cache is vocabulary-sized; callers invoking this repeatedly on a
    long-lived session should ``spark.catalog.clearCache()`` between
    runs (same hygiene note as pipeline/graph.py)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), " "),
                           lambda x: x != "")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    kept = counts.orderBy(F.col("c").desc(), "tok").limit(top_k)
    # total tokens from the vocab agg (no second corpus pass); kn/kv =
    # kept mass / kept types; smoothing denominator n + kv + 1 (<unk>)
    consts = (counts.agg(F.sum("c").alias("n"))
              .crossJoin(kept.agg(F.sum("c").alias("kn"),
                                  F.count(F.lit(1)).alias("kv"))))
    lm = (kept.crossJoin(F.broadcast(consts))
          .select("tok",
                  _unats(F.col("c") + 1,
                         F.col("n") + F.col("kv") + 1).alias("nll_u")))
    unk = _unats(F.col("n") - F.col("kn") + 1,
                 F.col("n") + F.col("kv") + 1)
    return (toks.join(F.broadcast(lm), "tok", "left")
            .crossJoin(F.broadcast(consts))
            .select(id_col, F.coalesce(F.col("nll_u"), unk).alias("nll_u"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.sum("nll_u").cast("double") / 1e6
                         / F.count(F.lit(1)), 4).alias("cross_entropy")))


def bigram_backoff_scores(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", top_k: int = 4096,
                          alpha: float = 0.4) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy): stupid-backoff bigram scoring
    (Brants et al. 2007, the web-scale LM device CCNet's KenLM
    generalizes): token i with predecessor h scores
    ``-ln(c(h,w)/c(h))`` when the bigram is among the ``top_k`` most
    frequent, else ``-ln(alpha) + unigram NLL``; each document's first
    token takes the unigram path un-penalized.  Same exactness device
    as :func:`unigram_lm_scores` — per-TYPE micro-nat quantization
    (bigram types and unigram types), exact long sums per document.

    Plan: adjacent pairs come from ``arrays_zip`` of the token array
    with its own shift — a narrow projection, never a positional
    self-join; bigram/unigram counts are aggs over the exploded forms
    and both capped LMs return as broadcasts.  The corpus is scanned
    four times (unigram train, bigram train, first-token score,
    pair score) — deliberate: the alternative is caching a
    corpus-sized token-array column, which at web scale costs far more
    memory than three extra narrow scans.  Text never shuffles.  Same
    persist + clearCache note as unigram."""
    toks_arr = F.filter(F.split(F.lower(F.col(text_col)), " "),
                        lambda x: x != "")
    base = docs.select(F.col(id_col), toks_arr.alias("_toks"))
    toks = base.select(id_col, F.posexplode("_toks").alias("pos", "tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    kept = counts.orderBy(F.col("c").desc(), "tok").limit(top_k)
    consts = (counts.agg(F.sum("c").alias("n"))
              .crossJoin(kept.agg(F.sum("c").alias("kn"),
                                  F.count(F.lit(1)).alias("kv"))))
    back = F.lit(round(-__import__("math").log(alpha) * 1e6))
    uni = (kept.crossJoin(F.broadcast(consts))
           .select("tok", _unats(F.col("c") + 1,
                                 F.col("n") + F.col("kv") + 1).alias("u_u")))
    unk = _unats(F.col("n") - F.col("kn") + 1, F.col("n") + F.col("kv") + 1)

    n_pairs = F.greatest(F.size("_toks") - 1, F.lit(0))
    pairs = base.select(
        id_col,
        F.posexplode(F.arrays_zip(
            F.slice("_toks", 1, n_pairs).alias("h"),
            F.slice("_toks", 2, n_pairs).alias("w")
        )).alias("pos", "pair")) \
        .select(id_col, F.col("pos"),
                F.col("pair.h").alias("h"), F.col("pair.w").alias("tok"))
    bi_counts = pairs.groupBy("h", "tok").agg(F.count(F.lit(1)).alias("bc"))
    bi_kept = bi_counts.orderBy(F.col("bc").desc(), "h", "tok").limit(top_k)
    # bigram NLL needs c(h): join the (persisted) unigram counts —
    # top_k rows against the vocab table, broadcast the small side
    bi_lm = (F.broadcast(bi_kept)
             .join(counts.withColumnRenamed("tok", "h")
                         .withColumnRenamed("c", "hc"), "h")
             .select("h", "tok", _unats(F.col("bc"), F.col("hc"))
                     .alias("b_u")))

    # first token of each doc: unigram path, no backoff penalty
    first = toks.filter(F.col("pos") == 0) \
        .join(F.broadcast(uni), "tok", "left") \
        .crossJoin(F.broadcast(consts)) \
        .select(id_col, F.coalesce("u_u", unk).alias("nll_u"))
    rest = (pairs.join(F.broadcast(bi_lm), ["h", "tok"], "left")
            .join(F.broadcast(uni), "tok", "left")
            .crossJoin(F.broadcast(consts))
            .select(id_col,
                    F.coalesce(F.col("b_u"),
                               back + F.coalesce("u_u", unk)).alias("nll_u")))
    return (first.unionByName(rest)
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.sum("nll_u").cast("double") / 1e6
                         / F.count(F.lit(1)), 4).alias("cross_entropy")))
