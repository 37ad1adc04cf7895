"""Greedy fixed-capacity sequence packing — the "pack documents into
training sequences" step of an LLM data pipeline.

Documents are hash-bucketed and packed independently per bucket in
``doc_id`` order; packing is inherently sequential, so the bucket is the
unit of parallelism (real pipelines pack per shard/worker exactly like
this).  Within a bucket a running token total is kept; when adding the
next document would overflow ``capacity`` (and the current sequence is
non-empty), a new sequence starts.  A document longer than ``capacity``
occupies a sequence of its own.  Deterministic: (bucket, order) fully
define the layout, which is what makes the DuckDB recursive-CTE oracle
possible.

At 100 TB: one shuffle on the bucket key, then a single sequential pandas
pass per bucket (O(rows) with a numpy-backed loop).  Buckets should be
sized so one bucket's (doc_id, n_tokens) pairs fit a worker — the text
itself never moves; only id + token count shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens_col


def greedy_pack(counts: list, capacity: int) -> tuple[list, list]:
    """The sequential fold: → (seq index, offset) per input, in order.
    A new sequence starts when adding the next count would overflow a
    NON-EMPTY sequence; an oversized count occupies a sequence alone.
    Property-tested in tests/test_pack.py (hypothesis)."""
    seqs, offs = [], []
    acc = 0
    seq = 0
    for n in counts:
        if acc > 0 and acc + n > capacity:
            seq += 1
            acc = 0
        offs.append(acc)
        seqs.append(seq)
        acc += n
    return seqs, offs


def pack_sequences(docs: DataFrame, capacity: int = 512, n_buckets: int = 8,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """→ (bucket, doc_id, n_tokens, seq, offset): greedy packing of
    whitespace-token counts into sequences of ``capacity`` tokens."""
    src = docs.select(
        (F.col(id_col) % n_buckets).cast("int").alias("bucket"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        seqs, offs = greedy_pack(pdf["n_tokens"].to_list(), capacity)
        pdf["seq"] = pd.Series(seqs, dtype="int64")
        pdf["offset"] = pd.Series(offs, dtype="int64")
        return pdf

    return src.groupBy("bucket").applyInPandas(
        pack, schema="bucket int, doc_id long, n_tokens long, "
                     "seq long, offset long")
