"""Salted aggregation/join and as-of join: identical results to the plain
operators, verified on skewed data."""

import random

from pyspark.sql import functions as F

from ner_spark.operators import asof_join, salted_count, salted_join


def _skewed_df(spark, n=2000):
    rng = random.Random(3)
    rows = [(1 if rng.random() < 0.6 else rng.randint(2, 50), rng.random())
            for _ in range(n)]
    return spark.createDataFrame(rows, "k int, v double")


def test_salted_count_equals_plain(spark):
    df = _skewed_df(spark)
    got = {r.k: r.cnt for r in salted_count(df, "k").collect()}
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want


def test_salted_join_equals_plain(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 51)], "k int, name string")
    got = sorted((r.k, r.v, r.name) for r in
                 salted_join(big, small, "k", salt_k=4).collect())
    want = sorted((r.k, r.v, r.name) for r in big.join(small, "k").collect())
    assert got == want


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 20.0), (3, "u", 5.0), (4, "v", 8.0)],
        "event_id int, user_id string, ts double")
    right = spark.createDataFrame(
        [("u", 9.0, 100.0), ("u", 15.0, 200.0), ("v", 99.0, 300.0)],
        "user_id string, ts double, val double")
    out = {r.event_id: r.val for r in asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_vals=["val"]).collect()}
    assert out == {1: 100.0, 2: 200.0, 3: None, 4: None}


def test_asof_join_tie_right_before_left(spark):
    # equal timestamps: right row (side=0) sorts before left → visible
    left = spark.createDataFrame([(1, "u", 10.0)],
                                 "event_id int, user_id string, ts double")
    right = spark.createDataFrame([("u", 10.0, 7.0)],
                                  "user_id string, ts double, val double")
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    right_vals=["val"]).collect()
    assert out[0].val == 7.0


def test_interval_join_equals_theta(spark):
    from ner_spark.operators import interval_join

    pts = spark.createDataFrame([(i, i * 7 % 100) for i in range(60)],
                                "pid long, d long")
    ivs = spark.createDataFrame(
        [(j, j * 13 % 90, j * 13 % 90 + 5 + j % 20) for j in range(25)],
        "iid long, s long, e long")
    got = {(r.pid, r.iid) for r in
           interval_join(pts, ivs, "d", "s", "e", bucket_width=16).collect()}
    want = {(p.pid, i.iid) for p in pts.collect() for i in ivs.collect()
            if i.s <= p.d < i.e}
    assert got == want and want


def test_interval_join_plan_no_cartesian(spark):
    from ner_spark.operators import interval_join

    pts = spark.createDataFrame([(1, 5)], "pid long, d long")
    ivs = spark.createDataFrame([(1, 0, 10)], "iid long, s long, e long")
    plan = interval_join(pts, ivs, "d", "s", "e", 8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_negative_domain(spark):
    """Bucketing uses cast-to-long truncation on BOTH sides; monotonicity
    makes containment hold across zero (points/dates before the epoch)."""
    from ner_spark.operators import interval_join

    pts = spark.createDataFrame(
        [(i, v) for i, v in enumerate(range(-120, 121, 7))],
        "pid long, d long")
    ivs = spark.createDataFrame(
        [(1, -100, -20), (2, -50, 50), (3, -5, 5), (4, 30, 125)],
        "iid long, s long, e long")
    got = {(r.pid, r.iid) for r in
           interval_join(pts, ivs, "d", "s", "e", bucket_width=90).collect()}
    want = {(p.pid, i.iid) for p in pts.collect() for i in ivs.collect()
            if i.s <= p.d < i.e}
    assert got == want and want


def test_salted_join_plan_joins_on_salt(spark):
    """The physical plan must actually join on (key, _salt) — the whole
    point of the operator is that a hot key is spread over salt_k
    reducers; a plan that optimized the salt away would silently degrade
    to the skewed join."""
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 51)], "k int, name string")
    plan = salted_join(big, small, "k", salt_k=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_lsh_plan_construction_runs_no_job(spark):
    """hyperplane_buckets must not touch the cluster while the plan is
    being BUILT (it used to run a first() to sniff the vector dim —
    a driver action inside query construction)."""
    from ner_spark.similarity.ann import lsh_near_dup_pairs, lsh_topk

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, -1.0, 0.5]) for i in range(16)],
        "vec_id long, embedding array<float>")
    sc = spark.sparkContext
    group = "plan-build-no-job"
    sc.setJobGroup(group, "plan construction must be lazy")
    try:
        df1 = lsh_topk(emb, emb.filter("vec_id < 2"), k=3, bits=4)
        df2 = lsh_near_dup_pairs(emb, threshold=0.5, bits=4)
        _ = df1.schema, df2.schema  # force analysis, not execution
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == []
    # and the lazily-derived hyperplanes still produce correct buckets:
    # bits=4 on 4-dim vectors, worker-side H == driver-side H
    import numpy as np
    from ner_spark.similarity.ann import hyperplane_buckets
    got = {r.vec_id: r.bucket
           for r in hyperplane_buckets(emb, bits=4, seed=42).collect()}
    H = np.random.RandomState(42).normal(size=(4, 4))
    for i in range(16):
        v = np.array([float(i), 1.0, -1.0, 0.5])
        want = int(((v @ H.T) > 0).astype(int) @ (1 << np.arange(4)))
        assert got[i] == want


# -- stable_split ----------------------------------------------------------

def test_stable_split_deterministic_and_exhaustive(spark, sf_dir):
    from ner_spark.operators import stable_split

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"]
         for r in stable_split(df, "doc_id", fr).collect()}
    b = {r["doc_id"]: r["split"]
         for r in stable_split(df, "doc_id", fr).collect()}
    assert a == b                       # pure function of the key
    assert set(a.values()) <= set(fr)   # every row assigned, no NULLs
    n = len(a)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.7 * n <= n_train <= 0.9 * n  # ~80% within tolerance


def test_stable_split_is_stable_under_corpus_growth(spark):
    """A doc's split must not change when new docs arrive (the property
    rand()-based splits lack)."""
    from ner_spark.operators import stable_split

    fr = {"train": 0.8, "test": 0.2}
    small = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"]
         for r in stable_split(small, "doc_id", fr).collect()}
    b = {r["doc_id"]: r["split"]
         for r in stable_split(big, "doc_id", fr).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_stable_split_zero_shuffle_and_fraction_validation(spark, sf_dir):
    import pytest as _pytest

    from ner_spark.operators import stable_split

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = stable_split(df, "doc_id", {"a": 0.5, "b": 0.5}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan       # pure narrow projection
    with _pytest.raises(ValueError):
        stable_split(df, "doc_id", {"a": 0.5, "b": 0.4})


def test_split_thresholds_cover_full_hash_space():
    from ner_spark.operators import split_thresholds

    ths = split_thresholds({"train": 1 / 3, "val": 1 / 3, "test": 1 / 3})
    assert ths[-1] == ("test", "ffffffff")  # forced closure of the range
    assert ths[0][1] < ths[1][1] <= ths[-1][1]


def test_corrupt_triples_deterministic_and_filtered(spark):
    from ner_spark.operators import corrupt_triples

    pos = spark.createDataFrame(
        [("e:1", "p", "e:2"), ("e:3", "p", "e:4")],
        "subj string, pred string, obj string")
    ents = spark.createDataFrame([(f"e:{i}",) for i in range(1, 6)],
                                 "id string")
    a = sorted(map(tuple, corrupt_triples(pos, ents, k=3).collect()))
    b = sorted(map(tuple, corrupt_triples(
        pos.repartition(7), ents, k=3).collect()))
    assert a == b and len(a) > 0          # rerun/partitioning stability
    pool = {f"e:{i}" for i in range(1, 6)}
    for subj, pred, obj, rank, neg in a:
        assert neg in pool and neg != obj  # filtered sampling
        assert 1 <= rank <= 3
    # a triple may yield < k rows, never more
    from collections import Counter
    per = Counter((s, p, o) for s, p, o, _, _ in a)
    assert all(v <= 3 for v in per.values())
