"""PII scrubbing for web-text curation: mask emails, IPv4 addresses and
international phone numbers before training-data emission.

Entirely JVM-side (`regexp_replace` / `regexp_count` inside whole-stage
codegen — no Python in the hot path); the patterns are deliberately
written in the common subset of Java regex and RE2/`re` syntax so the
same strings drive the Spark job, the DuckDB oracle and the pytest
`re` oracle (no lookbehind, no possessive quantifiers).

This is masking, not detection-grade NER: the standard cheap pass (the
C4/Gopher-style pipelines run exactly these three classes) — the KB-driven
mention pipeline is the heavyweight path when entity-level decisions are
needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: emails contain digit runs a phone pattern could nibble
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]?\d{2,4}([ -]?\d{2,4}){2,4}\b", "<PHONE>"),
]


def scrub_pii(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """→ (id, clean, n_email, n_ipv4, n_phone, has_pii): masked text plus
    per-category match counts (counted BEFORE masking, each category on
    the output of the previous mask so counts compose like the masking)."""
    cur: Column = F.col(text_col)
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[name] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    out = df.select(
        F.col(id_col),
        cur.alias("clean"),
        *[counts[n].cast("long").alias(f"n_{n}") for n, _, _ in PII_PATTERNS])
    total = sum(F.col(f"n_{n}") for n, _, _ in PII_PATTERNS)
    return out.withColumn("has_pii", total > 0)
