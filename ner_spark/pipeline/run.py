"""End-to-end orchestration: pages + KB → canonicalized triple table.

Stage graph (SURVEY §4 target plan):

  pages ──(narrow mapInPandas, broadcast KB+automaton)──► mentions
  mentions ──persist/materialize──┬─► mention triples  (narrow)
                                  └─► co-mention edges (shuffle url,par → agg)
  kb ───────────────────────────────► type/attribute triples (narrow)
  kb.redirects ──CC loop──► sameAs mapping ──broadcast──► canonical remap
  all ──► resumable bucketed write + per-partition lineage

``mentions`` is consumed by two branches, so it is persisted (or, with
``materialize_mentions``, written to parquet and re-read — the pattern a
multi-day 100 TB run would use so the expensive scan is checkpointed).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from ner_spark.io.catalog import resumable_write
from ner_spark.kb.build import KBArtifacts, compile_kb
from ner_spark.pipeline.ner import extract_mentions
from ner_spark.pipeline.triples import build_triples


@dataclass
class PipelineResult:
    artifacts: KBArtifacts
    mentions: DataFrame
    triples: DataFrame
    manifest: dict | None = None


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    kb_rows: list[dict],
    out_path: str | None = None,
    n_buckets: int = 64,
    url_col: str = "url",
    text_col: str = "text",
    materialize_mentions: str | None = None,
) -> PipelineResult:
    artifacts = compile_kb(spark, kb_rows)
    mentions = extract_mentions(pages, artifacts, url_col=url_col, text_col=text_col)
    if materialize_mentions:
        mentions.write.mode("overwrite").parquet(materialize_mentions)
        mentions = spark.read.parquet(materialize_mentions)
    else:
        mentions = mentions.persist(StorageLevel.MEMORY_AND_DISK)
    triples = build_triples(mentions, artifacts.kb_df)
    manifest = None
    if out_path:
        manifest = resumable_write(triples, os.path.join(out_path, "triples"),
                                   key="subj", n_buckets=n_buckets)
    return PipelineResult(artifacts, mentions, triples, manifest)
