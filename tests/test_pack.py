"""Sequence packing, dedup clustering, and source quota operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_spark.textops.pack import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pack_sequences_greedy_semantics(spark):
    # single bucket (n_buckets=1): token counts 3,4,5,10,2 with capacity 8
    # → [3,4] | [5] | [10] | [2]  (greedy, overflow starts a new sequence,
    # oversized doc occupies its own)
    rows = [(i, "s", " ".join(["w"] * n))
            for i, n in enumerate([3, 4, 5, 10, 2])]
    out = {r.doc_id: (r.seq, r.offset, r.n_tokens)
           for r in pack_sequences(_docs(spark, rows), capacity=8,
                                   n_buckets=1).collect()}
    assert out == {0: (0, 0, 3), 1: (0, 3, 4), 2: (1, 0, 5),
                   3: (2, 0, 10), 4: (3, 0, 2)}


def test_pack_sequences_never_overflows_capacity(spark):
    import random
    rng = random.Random(11)
    rows = [(i, "s", " ".join(["w"] * rng.randint(1, 40)))
            for i in range(200)]
    cap = 64
    out = pack_sequences(_docs(spark, rows), capacity=cap, n_buckets=4) \
        .collect()
    assert len(out) == 200
    per_seq: dict = {}
    for r in out:
        per_seq.setdefault((r.bucket, r.seq), []).append(r)
    for (_, _), members in per_seq.items():
        total = sum(m.n_tokens for m in members)
        if len(members) > 1:  # multi-doc sequences respect the capacity
            assert total <= cap
        # offsets are the running prefix in doc_id order
        members.sort(key=lambda m: m.doc_id)
        acc = 0
        for m in members:
            assert m.offset == acc
            acc += m.n_tokens


def test_dedup_clusters_labels_every_doc(spark):
    from ner_spark.textops.dedup import dedup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "s", base),
        (2, "s", base + " iota"),          # near-dup of 1
        (3, "s", base + " kappa"),         # near-dup of 1 and 2
        (4, "s", "totally different words here nothing shared at all"),
        (5, "t", base),                    # other block: no cross-block pair
    ]
    out = {r.doc_id: (r.canonical_id, r.is_kept)
           for r in dedup_clusters(_docs(spark, rows), block_col="source",
                                   threshold=0.5).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[4] == (4, True)
    assert out[5] == (5, True)  # blocking key scopes the pairs


@pytest.mark.parametrize("m", [1, 3])
def test_source_quota_shape(spark, sf_dir, m):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import Window
    w = Window.partitionBy("source").orderBy(
        F.desc("n_tokens"), F.asc("doc_id"))
    base = d.select("source", "doc_id",
                    F.size(F.filter(F.split("text", " "),
                                    lambda x: x != "")).alias("n_tokens"))
    out = base.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= m)
    per_src = out.groupBy("source").count().collect()
    assert per_src and all(r["count"] <= m for r in per_src)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), max_size=60),
       st.integers(min_value=1, max_value=30))
def test_greedy_pack_invariants(counts, capacity):
    from ner_spark.textops.pack import greedy_pack

    seqs, offs = greedy_pack(counts, capacity)
    assert len(seqs) == len(offs) == len(counts)
    per_seq: dict = {}
    for n, s, o in zip(counts, seqs, offs):
        per_seq.setdefault(s, []).append((o, n))
    prev = -1
    for s in sorted(per_seq):
        assert s == prev + 1  # sequence ids are dense, in order
        prev = s
        items = per_seq[s]
        acc = 0
        for o, n in items:  # offsets are the running prefix
            assert o == acc
            acc += n
            # the no-overflow contract: an item appended to a non-empty
            # prefix fits (zero-offset items may exceed capacity alone —
            # incl. after zero-count docs, which never "open" a sequence)
            if o > 0:
                assert o + n <= capacity
    # greediness: an item never starts a new sequence it could have
    # avoided — if item i opens sequence s>0, then placing it at the end
    # of s-1 would have overflowed (or s-1 was "closed" by construction)
    for i in range(len(counts)):
        if i and seqs[i] != seqs[i - 1]:
            prev_total = offs[i - 1] + counts[i - 1]
            assert prev_total + counts[i] > capacity


def test_curate_cross_stage_semantics(spark):
    """Canonical selection runs on the FULL corpus: a quality-rejected
    canonical must NOT promote its near-dup twin to kept — the twin stays
    non-canonical and is dropped too."""
    from ner_spark.textops.curate import curate

    good = ("the quick brown fox jumps over the lazy dog and keeps going "
            "with many more plain english words to pass the gates " * 2)
    rows = [
        (1, "s", good),                       # canonical, quality-ok → keep
        (2, "s", good + " extra token"),      # near-dup of 1 → dropped
        (3, "s", ";;; ### !!! @@@ 123"),      # quality-reject, unique
        (10, "s", "the benchmark sentinel shingle alpha beta gamma delta "
                  + good),                    # contaminated (shares 4-gram)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    bench = spark.createDataFrame(
        [(99, "b", "the benchmark sentinel shingle alpha beta gamma delta")],
        "doc_id long, source string, text string")
    out = {r.doc_id: r for r in curate(docs, bench, min_tokens=5).collect()}
    assert out[1].keep and out[1].is_canonical and out[1].quality_ok
    assert not out[2].keep and not out[2].is_canonical
    assert out[2].canonical_id == 1
    assert not out[3].keep and not out[3].quality_ok
    assert not out[10].keep and out[10].contaminated
