"""Text-curation operators: dedup (exact / jaccard / minhash / simhash) and
analysis (tokens, quality, lang-id, fingerprint)."""

import pytest
from pyspark.sql import functions as F

from ner_spark.textops.analysis import (FP_MOD, fingerprint, lang_id,
                                        quality_score, token_stats)
from ner_spark.textops.dedup import (exact_duplicates, jaccard_pairs,
                                     minhash_lsh_pairs, minhash_signatures,
                                     simhash_near_dups, simhash_signatures)

DOCS = [
    (1, "a", "the cat sat on the mat and looked at the dog"),
    (2, "a", "the cat sat on the mat and looked at a bird"),   # near-dup of 1
    (3, "a", "completely different words appear in this one sentence"),
    (4, "b", "the cat sat on the mat and looked at the dog"),  # exact dup of 1
    (5, "b", "quantum chromodynamics lattice computations diverge slowly"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, source string, text string")


def test_exact_duplicates(docs_df):
    got = {(r.doc_id, r.group_size) for r in exact_duplicates(docs_df).collect()}
    assert got == {(1, 2), (4, 2)}


def test_jaccard_pairs_blocked(docs_df):
    out = {(r.id1, r.id2): r.jaccard for r in
           jaccard_pairs(docs_df, block_col="source", threshold=0.5).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.5
    assert (1, 3) not in out
    assert (1, 4) not in out  # different block — blocking respected


def test_minhash_exact_dup_sig_identical(docs_df):
    sigs = {r.doc_id: tuple(r.sig) for r in
            minhash_signatures(docs_df).collect()}
    assert sigs[1] == sigs[4]
    # near-dup signatures mostly agree; distinct docs mostly disagree
    agree_near = sum(a == b for a, b in zip(sigs[1], sigs[2])) / len(sigs[1])
    agree_far = sum(a == b for a, b in zip(sigs[1], sigs[5])) / len(sigs[1])
    assert agree_near > 0.4 > agree_far


def test_minhash_lsh_pairs_finds_near_dups(docs_df):
    got = {(r.id1, r.id2) for r in
           minhash_lsh_pairs(docs_df, threshold=0.4).collect()}
    assert (1, 4) in got  # exact dup always survives
    assert (1, 2) in got or (2, 4) in got  # near-dup found via banding
    assert (3, 5) not in got


def test_simhash_near_dups(docs_df):
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs_df).collect()}
    assert sigs[1] == sigs[4]
    got = {(r.id1, r.id2): r.hamming for r in
           simhash_near_dups(docs_df, max_hamming=16).collect()}
    assert got.get((1, 4)) == 0
    if (1, 2) in got:
        assert got[(1, 2)] <= 16


def test_token_stats_oracle(docs_df):
    r = {x.doc_id: x for x in token_stats(docs_df).collect()}
    toks = DOCS[0][2].split()
    assert r[1].n_tokens == len(toks)
    assert r[1].n_distinct == len(set(toks))
    assert r[1].avg_token_len == pytest.approx(
        round(sum(map(len, toks)) / len(toks), 4))


def test_quality_score_ranges(docs_df):
    for r in quality_score(docs_df).collect():
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.alpha_ratio <= 1.0
    r1 = {x.doc_id: x for x in quality_score(docs_df).collect()}[1]
    assert r1.stopword_ratio > 0.2  # 'the'/'at'/'and'/'on' heavy


def test_lang_id_marker_words(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house is big"),
         (2, "el perro de la casa que los gatos"),
         (3, "der hund und die katze das ist gut")],
        "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de"}


def test_fingerprint_deterministic_and_sensitive(docs_df):
    fps = {r.doc_id: r.fingerprint for r in fingerprint(docs_df).collect()}
    assert fps[1] == fps[4]
    assert fps[1] != fps[2]
    assert all(0 <= v < FP_MOD for v in fps.values())


def test_ngram_jaccard_shingles(spark):
    from ner_spark.textops.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "x", "a b c d e"), (2, "x", "a b c d f"), (3, "x", "q r s t u")],
        "doc_id long, source string, text string")
    got = {(r.id1, r.id2): r.jaccard
           for r in ngram_jaccard_pairs(df, "source", n=3, threshold=0.1).collect()}
    # doc1 shingles {abc,bcd,cde}, doc2 {abc,bcd,cdf} → J = 2/4
    assert got == {(1, 2): 0.5}


def test_token_counts_bpe(spark):
    from ner_spark.textops.analysis import token_counts_bpe

    df = spark.createDataFrame([(1, "hello, world 42!")],
                               "doc_id long, text string")
    r = token_counts_bpe(df).collect()[0]
    assert r.n_ws_tokens == 3
    # hello | , | world | 4 | 2 | !
    assert r.n_bpe_tokens == 6


def test_simhash_band_bounds_cover_64_bits():
    from ner_spark.textops.dedup import simhash_band_bounds

    for h in (0, 1, 3, 5, 8, 16, 63):
        bounds = simhash_band_bounds(h)
        assert len(bounds) == h + 1
        assert sum(w for _, w in bounds) == 64
        # contiguous, non-overlapping
        off = 0
        for o, w in bounds:
            assert o == off and w >= 1
            off += w


def test_simhash_recall_vs_bruteforce(spark):
    """Pigeonhole-banding recall gate: at every radius, the banded join
    must return EXACTLY the pairs brute force finds (round-1 bug: fixed
    4x16-bit bands lost distance-4..8 pairs at max_hamming=8)."""
    from ner_spark.textops.dedup import simhash_near_dups, simhash_signatures

    # many small docs over a shared vocabulary -> a spread of Hamming
    # distances incl. the 4..8 range the old banding dropped
    vocab = ("red blue green gold iron stone wolf raven king queen "
             "ship storm night dawn ash elm oak fen moor vale").split()
    rows = []
    for i in range(40):
        toks = [vocab[(i * 7 + j * 3) % len(vocab)] for j in range(12)]
        if i % 3 == 0:
            toks[i % 12] = vocab[(i * 5 + 1) % len(vocab)]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {r.doc_id: r.simhash & 0xFFFFFFFFFFFFFFFF
            for r in simhash_signatures(df).collect()}
    for h in (3, 5, 8):
        want = {(a, b) for a in sigs for b in sigs if a < b
                and bin(sigs[a] ^ sigs[b]).count("1") <= h}
        got = {(r.id1, r.id2) for r in
               simhash_near_dups(df, max_hamming=h).collect()}
        assert got == want, f"radius {h}: {got ^ want}"


def test_lsh_jaccard_equals_allpairs_kernel(docs_df):
    """The composed LSH-candidates + exact-verify query must reproduce the
    exhaustive all-pairs kernel exactly at the design threshold."""
    from ner_spark.textops.dedup import lsh_jaccard_pairs

    for block in ("source", None):
        kw = dict(block_col=block, threshold=0.5)
        want = {(r.id1, r.id2): r.jaccard
                for r in jaccard_pairs(docs_df, block_col=block or "source",
                                       threshold=0.5).collect()} if block else None
        got = {(r.id1, r.id2): r.jaccard
               for r in lsh_jaccard_pairs(docs_df, **kw).collect()}
        if block:
            assert got == want
        else:
            # unblocked: superset of the blocked result, same values
            assert (1, 4) in got and got[(1, 4)] == 1.0


def test_lsh_jaccard_plan_has_no_cross_product(docs_df):
    from ner_spark.textops.dedup import lsh_jaccard_pairs

    plan = lsh_jaccard_pairs(docs_df, block_col="source", threshold=0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_flags(spark):
    from ner_spark.textops.decontaminate import contamination_flags

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], "doc_id long, text string")
    corpus = spark.createDataFrame([
        (1, "we saw the quick brown fox yesterday evening"),  # 4-gram hit
        (2, "completely unrelated sentence with other words here"),
        (3, "short text"),                                     # < n tokens
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in
           contamination_flags(corpus, bench, n=4).collect()}
    assert got[1].contaminated and got[1].n_hits >= 1
    assert not got[2].contaminated and got[2].n_hits == 0
    assert not got[3].contaminated  # single under-length shingle, no hit
    assert got[1].ratio > 0.0


def test_lsh_ngram_jaccard_equals_allpairs_kernel(docs_df):
    from ner_spark.textops.dedup import lsh_jaccard_pairs, ngram_jaccard_pairs

    want = {(r.id1, r.id2): r.jaccard for r in
            ngram_jaccard_pairs(docs_df, "source", n=3, threshold=0.3).collect()}
    got = {(r.id1, r.id2): r.jaccard for r in
           lsh_jaccard_pairs(docs_df, block_col="source", shingle=3,
                             threshold=0.3).collect()}
    assert got == want and want  # non-empty on the near-dup fixture


def test_simhash_radius_zero(spark):
    """Radius 0 = exact-duplicate grouping: one 64-bit band (the mask-free
    path); only identical signatures pair up."""
    from ner_spark.textops.dedup import simhash_near_dups

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat sat on the mat"),
         (3, "entirely different words here")],
        "doc_id long, text string")
    got = {(r.id1, r.id2): r.hamming
           for r in simhash_near_dups(df, max_hamming=0).collect()}
    assert got == {(1, 2): 0}


def test_gopher_rules_verdicts(spark):
    """Hand-built docs exercising each rule branch: a clean passing doc,
    a too-short doc, a bullet-list doc, and an all-symbol doc."""
    from ner_spark.textops.analysis import gopher_rules

    clean = ("the quick brown fox jumps over the lazy dog and it was "
             "seen in a park of old trees for hours ") * 3  # >50 words
    bullets = "\n".join(f"- item {i} of the list" for i in range(20))
    symbols = " ".join("$$$" for _ in range(80))
    df = spark.createDataFrame(
        [("clean", clean), ("short", "tiny text"),
         ("bullets", bullets), ("symbols", symbols)],
        "doc_id string, text string")
    got = {r.doc_id: r for r in gopher_rules(df, min_words=20).collect()}
    assert got["clean"].keep
    assert not got["short"].keep            # word-count floor
    assert not got["bullets"].keep          # bullet_line_frac = 1.0 > 0.9
    assert got["bullets"].bullet_line_frac == 1.0
    assert not got["symbols"].keep          # alpha_word_frac = 0.0
    assert got["symbols"].alpha_word_frac == 0.0


def test_gopher_rules_crlf_lines(spark):
    """CRLF text: lines are split on \\r?\\n and the ellipsis anchor is
    \\z in BOTH engines, so a '...\\r\\n' line counts on the Spark side
    exactly as in the oracle (Java `$` would match before a trailing
    \\r; RE2 `$` would not — the class of divergence this pins out)."""
    from ner_spark.textops.analysis import gopher_rules

    text = "first line...\r\nsecond line\r\nthird...\r\n"
    df = spark.createDataFrame([("d", text)], "doc_id string, text string")
    r = gopher_rules(df, min_words=1).collect()[0]
    assert r.ellipsis_line_frac == 2 / 3


def test_unigram_lm_scores_exact(spark):
    """textops.lm vs an independent pure-Python recomputation: same
    top-k vocabulary (count desc, token asc), add-one smoothing, <unk>
    tail, integer micro-nat quantization.  Exercises the unk path
    (top_k < vocab) and the zero-token-document absence."""
    import math
    from collections import Counter

    from ner_spark.textops.lm import unigram_lm_scores

    texts = {1: "the cat sat on the mat", 2: "the the the the",
             3: "zyzzyva qwyjibo", 4: ""}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.cross_entropy)
           for r in unigram_lm_scores(docs, top_k=3).collect()}

    toks = {d: t.lower().split() for d, t in texts.items() if t}
    allc = Counter(t for ts in toks.values() for t in ts)
    kept = sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    n, kn, kv = sum(allc.values()), sum(c for _, c in kept), len(kept)
    lm = {t: round(-math.log((c + 1) / (n + kv + 1)) * 1e6)
          for t, c in kept}
    unk = round(-math.log((n - kn + 1) / (n + kv + 1)) * 1e6)
    want = {d: (len(ts), round(sum(lm.get(t, unk) for t in ts) / 1e6
                               / len(ts), 4))
            for d, ts in toks.items()}
    assert got == want          # doc 4 (zero tokens) absent from both


def test_bigram_backoff_exact(spark):
    """textops.lm.bigram_backoff_scores vs an independent pure-Python
    stupid-backoff recomputation: top-k bigram LM (count desc, pair asc),
    -ln(alpha) penalty on the unigram fallback, first token unigram
    un-penalized."""
    import math
    from collections import Counter

    from ner_spark.textops.lm import bigram_backoff_scores

    texts = {1: "the cat sat on the mat", 2: "the the the the",
             3: "zyzzyva qwyjibo zyzzyva qwyjibo", 4: ""}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    K, A = 3, 0.4
    got = {r.doc_id: (r.n_tokens, r.cross_entropy)
           for r in bigram_backoff_scores(docs, top_k=K, alpha=A).collect()}

    toks = {d: t.lower().split() for d, t in texts.items() if t}
    allc = Counter(t for ts in toks.values() for t in ts)
    kept = sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    n, kn, kv = sum(allc.values()), sum(c for _, c in kept), len(kept)
    uni = {t: round(-math.log((c + 1) / (n + kv + 1)) * 1e6)
           for t, c in kept}
    unk = round(-math.log((n - kn + 1) / (n + kv + 1)) * 1e6)
    bic = Counter((ts[i], ts[i + 1])
                  for ts in toks.values() for i in range(len(ts) - 1))
    bkept = sorted(bic.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    bi = {hw: round(-math.log(c / allc[hw[0]]) * 1e6) for hw, c in bkept}
    back = round(-math.log(A) * 1e6)
    want = {}
    for d, ts in toks.items():
        s = uni.get(ts[0], unk)
        for i in range(1, len(ts)):
            hw = (ts[i - 1], ts[i])
            s += bi[hw] if hw in bi else back + uni.get(ts[i], unk)
        want[d] = (len(ts), round(s / 1e6 / len(ts), 4))
    assert got == want
    spark.catalog.clearCache()


def test_lm_fuzz_corpus_parity(spark):
    """Both LM scorers vs pure-Python on a seeded adversarial corpus:
    multi-space runs, unicode, single-token docs, empty docs, repeated
    tokens, tokens colliding only after lower()."""
    import math
    import random
    from collections import Counter

    from ner_spark.textops.lm import (bigram_backoff_scores,
                                      unigram_lm_scores)

    rng = random.Random(11)
    vocab = ["The", "the", "Ünïcode", "a", "b", "zz", "Ünïcode!",
             "x" * 40, "§", "123"]
    texts = {}
    for d in range(1, 61):
        n = rng.randrange(0, 12)
        texts[d] = (" " * rng.randrange(1, 3)).join(
            rng.choice(vocab) for _ in range(n))
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    K, A = 5, 0.4
    toks = {d: [t for t in t_.lower().split(" ") if t]
            for d, t_ in texts.items()}
    toks = {d: ts for d, ts in toks.items() if ts}
    allc = Counter(t for ts in toks.values() for t in ts)
    kept = sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    n, kn, kv = sum(allc.values()), sum(c for _, c in kept), len(kept)
    uni = {t: round(-math.log((c + 1) / (n + kv + 1)) * 1e6)
           for t, c in kept}
    unk = round(-math.log((n - kn + 1) / (n + kv + 1)) * 1e6)

    got_u = {r.doc_id: (r.n_tokens, r.cross_entropy)
             for r in unigram_lm_scores(docs, top_k=K).collect()}
    want_u = {d: (len(ts), round(sum(uni.get(t, unk) for t in ts) / 1e6
                                 / len(ts), 4))
              for d, ts in toks.items()}
    assert got_u == want_u

    bic = Counter((ts[i], ts[i + 1])
                  for ts in toks.values() for i in range(len(ts) - 1))
    bkept = sorted(bic.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    bi = {hw: round(-math.log(c / allc[hw[0]]) * 1e6) for hw, c in bkept}
    back = round(-math.log(A) * 1e6)
    got_b = {r.doc_id: (r.n_tokens, r.cross_entropy)
             for r in bigram_backoff_scores(docs, top_k=K,
                                            alpha=A).collect()}
    want_b = {}
    for d, ts in toks.items():
        s = uni.get(ts[0], unk)
        for i in range(1, len(ts)):
            hw = (ts[i - 1], ts[i])
            s += bi[hw] if hw in bi else back + uni.get(ts[i], unk)
        want_b[d] = (len(ts), round(s / 1e6 / len(ts), 4))
    assert got_b == want_b
    spark.catalog.clearCache()


def test_unigram_lm_plan_shape(spark, docs_df):
    """Scale assertions: the LM joins back as a broadcast hash join, no
    cartesian product, and the top-k vocabulary comes from TakeOrdered
    (distributed partial top-k), never a single-task global sort."""
    from ner_spark.textops.lm import unigram_lm_scores

    df = unigram_lm_scores(docs_df, top_k=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    # the only SinglePartition exchanges are the two one-row scalar
    # aggregates (n / kn+kv) — partition-count-sized inputs, not
    # data-sized sorts (the corrupt_triples lesson does not apply)
    assert plan.count("Exchange SinglePartition") <= 2
    spark.catalog.clearCache()


def test_duplicated_window_stats(spark):
    """ExactSubstr detection: only the shared 20-token passage's windows
    count as duplicated; a within-doc repeat counts twice; short unique
    docs report zero."""
    from ner_spark.textops.dedup import duplicated_window_stats

    passage = " ".join(f"p{i}" for i in range(20))      # 20 shared tokens
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    docs = [
        (1, f"{uniq('a', 10)} {passage} {uniq('b', 10)}"),   # 40 toks
        (2, f"{uniq('c', 5)} {passage}"),                    # 25 toks
        (3, f"{passage} {passage}"),                         # within-doc repeat
        (4, uniq("d", 8)),                                   # short + unique
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in
           duplicated_window_stats(df, window=20).collect()}
    # doc 1: 21 windows, exactly one (the passage itself) duplicated
    assert (out[1].n_windows, out[1].n_dup_windows) == (21, 1)
    # doc 2: 6 windows, one duplicated
    assert (out[2].n_windows, out[2].n_dup_windows) == (6, 1)
    # doc 3: the passage occurs twice within one doc → both occurrences
    # duplicated, plus every bridging window repeats nowhere else
    assert out[3].n_windows == 21 and out[3].n_dup_windows >= 2
    assert out[3].dup_ratio > out[1].dup_ratio
    # doc 4: shorter than the window → its single whole-text window,
    # unique in the corpus
    assert (out[4].n_windows, out[4].n_dup_windows, out[4].dup_ratio) \
        == (1, 0, 0.0)
