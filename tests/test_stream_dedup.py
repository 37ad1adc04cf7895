"""Stateful streaming dedup: first-seen emission within and across
micro-batch boundaries (state survives via checkpoint)."""


def _write_batch(spark, path, rows, mode="append"):
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode(mode).parquet(path)


def test_stream_dedup_within_and_across_batches(spark, tmp_path):
    from ner_spark.streaming.dedup import run_stream_dedup

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    _write_batch(spark, inp, [(1, "alpha text"), (2, "beta text"),
                              (3, "alpha text")])
    q = run_stream_dedup(spark, inp, out, ckpt)
    q.awaitTermination(120)

    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2}          # doc 3 deduped in-batch
    assert got[1].n_dupes == 1 and got[2].n_dupes == 0

    # second batch: one repeat (dropped via state), one new
    _write_batch(spark, inp, [(4, "alpha text"), (5, "gamma text")])
    q2 = run_stream_dedup(spark, inp, out, ckpt)
    q2.awaitTermination(120)

    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 5}            # doc 4 deduped across batches


def test_embedding_near_dups_exact_and_lsh(spark):
    import numpy as np

    from ner_spark.similarity.ann import embedding_near_dups, lsh_near_dup_pairs

    rng = np.random.RandomState(5)
    base = rng.normal(size=(20, 16))
    vecs = list(base)
    vecs.append(base[0] + rng.normal(scale=0.01, size=16))  # near-dup of 0
    vecs.append(base[1])                                    # exact dup of 1
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")

    exact = {(r.id1, r.id2): r.cosine
             for r in embedding_near_dups(df, threshold=0.95).collect()}
    assert (0, 20) in exact and exact[(0, 20)] > 0.99
    assert (1, 21) in exact and exact[(1, 21)] == 1.0
    assert all(c >= 0.95 for c in exact.values())

    lsh = {(r.id1, r.id2) for r in
           lsh_near_dup_pairs(df, threshold=0.95, bits=4).collect()}
    assert lsh <= set(exact)  # subset property (recall < 1, precision 1)
    assert (1, 21) in lsh     # identical vectors always share every bucket
