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
