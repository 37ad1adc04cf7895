"""Stateful streaming deduplication (training-data ingest path).

Exact dedup across an unbounded document stream: the first document with a
given content digest is emitted, every later arrival (same micro-batch or
any later one) is dropped.  State = one flag per digest in the Spark state
store, managed by ``applyInPandasWithState`` — the custom-stateful-operator
form Structured Streaming provides for semantics the built-in
``dropDuplicates`` also covers; this implementation keeps the state
explicit so variants (count-keeping, TTL via GroupStateTimeout, near-dup
digests like SimHash chunks) drop in without re-plumbing.

No reference counterpart (the reference's daemon is stateless per doc,
ner.py:837-856); this is part of the training-data additions.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "digest string, doc_id long, text string, n_dupes long"
STATE_SCHEMA = "seen long"


def _dedup_group(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_before = state.get[0] if state.exists else 0
    first = None
    n = 0
    for pdf in pdfs:
        if first is None and len(pdf) and n_before == 0:
            first = pdf.iloc[[0]]
        n += len(pdf)
    state.update((n_before + n,))
    if first is not None:
        out = first.copy()
        out["n_dupes"] = n - 1  # duplicates within this first batch
        yield out[["digest", "doc_id", "text", "n_dupes"]]


def stream_dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """streaming docs → first-seen docs only (append mode).  Shuffles on the
    digest (uniform key — md5), state store scales with distinct docs."""
    keyed = docs.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"))
    return keyed.groupBy("digest").applyInPandasWithState(
        _dedup_group, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


def run_stream_dedup(spark, input_path: str, out_path: str, checkpoint: str,
                     schema: str = "doc_id long, text string"):
    """File-stream wrapper: watch ``input_path`` for parquet, append unique
    docs to ``out_path``; state survives restarts via the checkpoint."""
    docs = spark.readStream.schema(schema).parquet(input_path)
    return (
        stream_dedup_exact(docs)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
