"""Mention extraction: the hot path of the engine.

Design for 100 TB (SURVEY §4 physical plan): the whole per-document NER —
scan + disambiguation + coreference — is ONE narrow ``mapInPandas`` stage
over the pages table.  The reference has no cross-document state
(ner.py:837-856 resets per doc), so this stage needs **zero shuffles**: one
Arrow batch in, mention rows out, KB + automaton read from a per-executor
broadcast.  Everything relational (dedup, co-mention join, canonicalization)
happens downstream on the much smaller mentions/triples tables.

Column pruning matters: we select only (url, text) before the UDF so the
parquet/Iceberg scan never reads the binary ``html`` column (verified by
ReadSchema in tests/test_plans.py).

Sanitization (ner.py:611) runs JVM-side as a ``regexp_replace`` with the
exact reference character class — whole-stage-codegen'd, and tested
byte-identical to the Python ``re`` implementation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ner_spark.kb.build import KBArtifacts

# Java regex equivalent of textnorm.SANITIZE_RE (ner.py:611).  Control chars
# are spelled with \uXXXX escapes so the pattern survives any plan printing.
_SANITIZE_JAVA = "[;\\u0001-\\u0008\\u000e-\\u001f\\u000c\\u007f]"

MENTION_SCHEMA = (
    "url string, start int, end int, par int, kind string, "
    "text string, sense int, iso string, confidence int"
)
SCAN_SCHEMA = "url string, start int, end int, fragment string, ids array<int>"


def sanitized_pages(pages: DataFrame, url_col: str = "url",
                    text_col: str = "text") -> DataFrame:
    """Project to (url, text) — pruning ``html`` — and sanitize JVM-side.
    Null text becomes "" (real crawl tables contain nulls; the reference
    would never see them — stdin always yields a string)."""
    return pages.select(
        F.col(url_col).cast("string").alias("url"),
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")),
                         _SANITIZE_JAVA, " ").alias("text"),
    )


def scan_mentions(pages: DataFrame, artifacts: KBArtifacts,
                  url_col: str = "url", text_col: str = "text",
                  byte_offsets: bool = False) -> DataFrame:
    """Raw gazetteer matches only (stage M2) — no resolution.  Useful for
    debugging and for relational-filter queries; the production path is
    :func:`extract_mentions` which fuses scan+resolve in one pass.
    ``byte_offsets`` mirrors figa ``-b`` (figa/src/main.cpp:53,108-110):
    start/end become offsets into the UTF-8 byte stream."""
    src = sanitized_pages(pages, url_col, text_col)
    atm_bc = artifacts.automaton_bc

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ner_spark.semantics.automaton import byte_offset_matches

        atm = atm_bc.value
        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf["text"]):
                ms = atm.scan(text)
                if byte_offsets:
                    ms = byte_offset_matches(text, ms)
                for m in ms:
                    rows.append((url, m.start, m.end, m.fragment, list(m.ids)))
            yield pd.DataFrame(
                rows, columns=["url", "start", "end", "fragment", "ids"])

    return src.mapInPandas(fn, schema=SCAN_SCHEMA)


def extract_mentions(pages: DataFrame, artifacts: KBArtifacts,
                     url_col: str = "url", text_col: str = "text",
                     lowercase: bool = False, deaccent: bool = False,
                     find_names: bool = False, lang: str = "en",
                     names_strict: bool = False) -> DataFrame:
    """pages → final mention rows (scan + stages b-k fused, zero-shuffle).

    ``lowercase``/``deaccent`` mirror the reference's ``-d``/``-r`` modes
    and must match the automaton variant compiled with the same flags:
    ``deaccent`` TRANSFORMS the working text (ner.py:614, plain removal —
    offsets refer to the deaccented text), while ``lowercase`` only lowers
    the SCAN input (ner.py:473-476: figa reads input_string.lower() but
    the Entity keeps the original string, so resolution context slices
    and the printed text stay original-case; mention sources come from
    the lowered scan).  NB ``str.lower()`` can change length for rare
    code points (e.g. U+0130 İ → 2 chars), shifting scan offsets against
    the original text — the reference applies lowered-scan offsets to the
    original string with exactly the same caveat (bug-for-bug parity).
    ``find_names`` enables unknown-name discovery (``-n``,
    ner.py:696-697)."""
    src = sanitized_pages(pages, url_col, text_col)
    bundle_bc = artifacts.bundle_bc
    atm_bc = artifacts.automaton_bc

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ner_spark.semantics.lang import get_lang
        from ner_spark.semantics.recognize import scan_and_resolve
        from ner_spark.semantics.textnorm import remove_accent

        lang_mod = get_lang(lang)
        bundle = bundle_bc.value
        atm = atm_bc.value
        cols = ["url", "start", "end", "par", "kind", "text",
                "sense", "iso", "confidence"]
        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf["text"]):
                if deaccent:
                    # -r uses the plain (possibly length-changing)
                    # removal (ner.py:614) — offsets refer to the
                    # transformed text, as in the reference
                    text = remove_accent(text)
                scan_text = text.lower() if lowercase else None
                # fused C scan+resolve when covered; Python path otherwise
                # (semantics/recognize.scan_and_resolve)
                for r in scan_and_resolve(bundle, atm, text, scan_text,
                                          find_names=find_names,
                                          lang=lang_mod, as_tuples=True,
                                          names_strict=names_strict):
                    rows.append((url,) + r)
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(fn, schema=MENTION_SCHEMA)
