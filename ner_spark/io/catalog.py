"""Partitioned materialization with per-partition lineage + checkpoint resume.

North-rule requirement: the triple table is written partitioned, with a
per-partition lineage/metrics table, and a killed job can resume without
recomputing completed partitions (idempotent re-run).

Preferred backend is Apache Iceberg (hidden-partition bucket(subj), snapshot
isolation); its runtime jar is not in this image, so :func:`iceberg_available`
gates it and the default backend is parquet with:

  * explicit ``bucket = pmod(xxhash64(subj), N)`` partition column —
    the same layout ``partitionedBy(bucket(N, subj))`` would give on Iceberg;
  * dynamic partition overwrite (only touched buckets replaced);
  * a ``_lineage`` sidecar table ``(bucket, n_rows, fingerprint)`` written
    per completed bucket — the resume set and the metrics table in one
    (SURVEY A15).

Resume contract: :func:`resumable_write` skips buckets already present in
the lineage sidecar; re-running after a kill converges to the same table
(tests/test_lineage.py kills between buckets and re-runs).
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def dynamic_partition_overwrite(spark: SparkSession):
    """Set partitionOverwriteMode=dynamic for the duration of a write and
    restore the previous value — session-wide overwrite semantics must not
    silently change for unrelated writes later in the session."""
    key = "spark.sql.sources.partitionOverwriteMode"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

LINEAGE_DIR = "_lineage"
MANIFEST = "_manifest.json"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def with_bucket(df: DataFrame, key: str = "subj", n_buckets: int = 64) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


def _lineage_of(df: DataFrame) -> DataFrame:
    """Per-bucket row count + order-insensitive content fingerprint."""
    cols = [c for c in df.columns if c != "bucket"]
    row_hash = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\0"))
                            for c in cols])
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(row_hash).alias("fingerprint"),  # order-insensitive, no overflow
    )


def completed_buckets(spark: SparkSession, path: str) -> list[int]:
    lpath = os.path.join(path, LINEAGE_DIR)
    try:
        return [r.bucket for r in spark.read.parquet(lpath).select("bucket").collect()]
    except Exception:
        return []


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, LINEAGE_DIR))


def resumable_write(df: DataFrame, path: str, key: str = "subj",
                    n_buckets: int = 64,
                    fail_after_buckets: int | None = None) -> dict:
    """Write ``df`` partitioned by bucket(key), skipping buckets whose
    lineage rows already exist.  Returns a summary dict.

    ``fail_after_buckets`` is a test hook: raise after materializing that
    many buckets to simulate a mid-job kill.
    """
    spark = df.sparkSession
    bdf = with_bucket(df, key, n_buckets)
    done = set(completed_buckets(spark, path))
    todo_df = bdf.filter(~F.col("bucket").isin(list(done))) if done else bdf
    # one pass over the remaining data; cache so lineage doesn't recompute it
    todo_df = todo_df.persist()
    try:
        lineage = _lineage_of(todo_df).collect()
        todo_buckets = sorted(r.bucket for r in lineage)
        # co-locate each bucket before partitionBy: without this every
        # write task opens a file per bucket directory (tasks × buckets
        # files — 4M files at 1000 executors × 4096 buckets, and measured
        # 1.4-1.9× slower even at local[8]/64); hash-repartitioned on the
        # bucket column the output is ~one file per bucket
        def _colocated(df_):
            return df_.repartition(max(len(todo_buckets), 1), "bucket")

        if fail_after_buckets is not None and fail_after_buckets < len(todo_buckets):
            keep = set(todo_buckets[:fail_after_buckets])
            part = todo_df.filter(F.col("bucket").isin(list(keep)))
            with dynamic_partition_overwrite(spark):
                _colocated(part).write.mode("overwrite") \
                    .partitionBy("bucket").parquet(path)
            _append_lineage(spark, path, [r for r in lineage if r.bucket in keep])
            raise RuntimeError(
                f"injected failure after {fail_after_buckets} buckets")
        if todo_buckets:
            with dynamic_partition_overwrite(spark):
                _colocated(todo_df).write.mode("overwrite") \
                    .partitionBy("bucket").parquet(path)
            _append_lineage(spark, path, lineage)
        manifest = {
            "n_buckets": n_buckets, "key": key,
            "completed": sorted(done | set(todo_buckets)),
            "skipped_resume": sorted(done),
        }
        with open(os.path.join(path, MANIFEST), "w") as f:
            json.dump(manifest, f)
        return manifest
    finally:
        todo_df.unpersist()


def _append_lineage(spark: SparkSession, path: str, rows: list) -> None:
    if not rows:
        return
    lpath = os.path.join(path, LINEAGE_DIR)
    spark.createDataFrame(
        [(int(r.bucket), int(r.n_rows), int(r.fingerprint)) for r in rows],
        schema="bucket int, n_rows long, fingerprint long",
    ).write.mode("append").parquet(lpath)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
