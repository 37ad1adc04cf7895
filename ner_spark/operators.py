"""Reusable relational operators: skew-salting and as-of joins.

``salted_*`` implement the explicit hot-key handling the north rule asks
for (on top of AQE's runtime skew splitting): the skewed side gets a
deterministic salt, the small side is replicated ``salt_k`` times, and the
aggregation happens in two phases so no single reducer sees a whole hot key.

``asof_join`` gives the J4/J5 nearest-predecessor semantics (SURVEY §2.3)
as a composition of built-ins: union-tag + window ``last(ignorenulls)`` —
one shuffle on (key, ts), no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, salt_k: int = 8) -> DataFrame:
    """groupBy(key).count() in two phases via an explicit salt; result is
    identical to the plain aggregation (verified against the SQL oracle) but
    a hot key is spread over ``salt_k`` reducers in phase 1."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_k)))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("cnt"))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_k: int = 8) -> DataFrame:
    """Equi-join where ``big`` is skewed on ``key``: big side salted by a
    row hash, small side exploded ``salt_k``× so every (key, salt) bucket
    finds its match.  Same rows as ``big.join(small, key)``.

    When to reach for this instead of AQE skew-join (measured,
    BASELINE.md "Skew — round 4"): AQE's detector is BYTE-based and
    splits at map-output-block granularity, so it goes blind when
    column pruning or heavy compression shrinks the hot partition's
    bytes below threshold while its row count (what the reducer pays)
    stays huge, and it cannot split a hot key concentrated in few
    mappers.  Salting re-keys rows, immune to both, at ~2× AQE's
    best-case cost — so leave AQE on for payload-carrying shuffles and
    salt the pathological layouts."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_k)))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_k)])))
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_vals: list[str]) -> DataFrame:
    """For each left row: values of the most recent right row with
    ``right_ts <= left_ts`` in the same ``on`` group (ties: latest right_ts,
    then the row is already unique per ts in our uses).

    Implementation: tag and union both sides, sort by (ts, side) within the
    key, carry right values forward with ``last(..., ignorenulls=True)``,
    keep left rows.  One shuffle; no pandas.
    """
    l = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = right.withColumn("_side", F.lit(0)).withColumn("_ts", F.col(right_ts))
    lcols = [c for c in left.columns]
    assert not (set(lcols) & set(right_vals)), "right_vals must not collide"
    allcols = sorted(set(lcols) | set(right_vals) | {on})
    l = l.select(*(
        [F.col(c) if c in l.columns else F.lit(None).alias(c) for c in allcols]
        + [F.col("_side"), F.col("_ts")]))
    r = r.select(*(
        [F.col(c) if c in r.columns else F.lit(None).alias(c) for c in allcols]
        + [F.col("_side"), F.col("_ts")]))
    u = l.unionByName(r)
    w = (Window.partitionBy(on).orderBy(F.col("_ts"), F.col("_side"))
         .rowsBetween(Window.unboundedPreceding, 0))
    for v in right_vals:
        u = u.withColumn(v, F.last(F.when(F.col("_side") == 0, F.col(v)), True).over(w))
    return u.filter(F.col("_side") == 1).select(*lcols, *right_vals)


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str, start_col: str, end_col: str,
                  bucket_width: int) -> DataFrame:
    """Range/theta join ``start <= point < end`` WITHOUT a cross product:
    both sides are bucketized on ``point // bucket_width`` (an interval
    explodes into the few buckets it spans), the join is a plain hash
    equi-join on the bucket id, and the range predicate remains only as a
    residual filter within each bucket.

    Pick ``bucket_width`` near the typical interval length: each interval
    then lands in ~2 buckets, candidate pairs ≈ true pairs × O(1), and the
    shuffle key space is |domain|/width — the composition Spark's optimizer
    won't derive from a raw BETWEEN predicate (which plans as a
    BroadcastNestedLoopJoin).  Columns must be integers (days, epoch
    seconds, ...); all input columns are preserved."""
    p = points.withColumn(
        "_b", (F.col(point_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "_bs", (F.col(start_col) / bucket_width).cast("long")).withColumn(
        "_be", ((F.col(end_col) - 1) / bucket_width).cast("long"))
    iv = iv.withColumn("_b", F.explode(F.sequence("_bs", "_be"))) \
           .drop("_bs", "_be")
    return (
        p.join(iv, "_b")
        .filter((F.col(point_col) >= F.col(start_col))
                & (F.col(point_col) < F.col(end_col)))
        .drop("_b")
    )


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(name, 8-hex-digit upper bound) per split, cumulative order.

    The LAST split's bound is forced to 'ffffffff…' so the ranges cover
    the whole hash space regardless of float rounding in the cumsum."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out: list[tuple[str, str]] = []
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, format(min(int(cum * 16 ** 8), 16 ** 8 - 1), "08x")))
    out.append((names[-1], "f" * 8))
    return out


def stable_split(df: DataFrame, key_col: str,
                 fractions: dict[str, float],
                 out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment by hash RANGE, not rand().

    Each row's split is a pure function of ``key_col`` — stable across
    reruns, partitionings, and corpus growth (a doc keeps its split when
    new docs arrive; `rand()`-based splits reshuffle everything).  The
    hash is the first 8 hex chars of md5(key as string) compared against
    cumulative-fraction thresholds — md5 renders identically in Spark and
    ANSI SQL engines, so the assignment is exactly oracle-checkable.
    Pure narrow projection: zero shuffles at any scale."""
    hx = F.substring(F.md5(F.col(key_col).cast("string").cast("binary")),
                     1, 8)
    ths = split_thresholds(fractions)
    col = None  # WHENs chained in cumulative-threshold order
    for name, bound in ths[:-1]:
        col = (F.when if col is None else col.when)(
            hx <= F.lit(bound), F.lit(name))
    col = F.lit(ths[-1][0]) if col is None else col.otherwise(
        F.lit(ths[-1][0]))
    return df.withColumn(out_col, col)


def corrupt_triples(triples: DataFrame, entities: DataFrame, k: int = 2,
                    subj_col: str = "subj", pred_col: str = "pred",
                    obj_col: str = "obj",
                    ent_col: str = "id") -> DataFrame:
    """Deterministic negative sampling for KG link-prediction training:
    ``k`` corrupted variants per positive triple, the object replaced by
    ``entities[md5(subj|pred|obj|rank) mod n]`` over the id-sorted entity
    pool.  Corruptions equal to the true object are dropped (standard
    filtered sampling), so a triple can yield < k rows.

    Hash-based, not ``rand()`` — stable across reruns and partitionings
    (the property corpus-splitting already relies on,
    :func:`stable_split`), and md5-hex→BIGINT renders identically in
    Spark and ANSI engines so the sampler is exactly oracle-checkable.
    Plan: the entity pool is sorted by value (a PARALLEL range-partition
    sort) and indexed 0..n-1 with ``zipWithIndex`` — contiguous indices
    per partition in partition order, so the assignment equals the
    global-sort rank WITHOUT the single-task Exchange a partition-less
    ``row_number()`` window would plan (the oracle's ``row_number() OVER
    (ORDER BY neg_obj)`` stays valid because the index IS the sort
    rank); the indexed pool joins back as a broadcast and the pool size
    enters the plan as a broadcast one-row count (no driver action
    during query construction — zipWithIndex's partition-size job runs
    on the executors)."""
    spark = triples.sparkSession
    ents = entities.select(
        F.col(ent_col).cast("string").alias("neg_obj")).distinct()
    indexed = spark.createDataFrame(
        ents.sort("neg_obj").rdd.zipWithIndex()
            .map(lambda r: (r[0][0], r[1])),
        "neg_obj string, idx long")
    pool_n = indexed.agg(F.count(F.lit(1)).alias("_n"))
    reps = triples.select(subj_col, pred_col, obj_col).withColumn(
        "neg_rank", F.explode(F.array(*[F.lit(i) for i in range(1, k + 1)])))
    key = F.concat_ws("|", F.col(subj_col), F.col(pred_col),
                      F.col(obj_col), F.col("neg_rank"))
    h = F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10) \
        .cast("long")
    cands = reps.crossJoin(F.broadcast(pool_n)) \
        .withColumn("idx", h % F.col("_n")).drop("_n")
    return (cands.join(F.broadcast(indexed), "idx")
            .filter(F.col("neg_obj") != F.col(obj_col))
            .select(subj_col, pred_col, obj_col, "neg_rank", "neg_obj"))
