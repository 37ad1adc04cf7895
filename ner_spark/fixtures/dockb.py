"""Mini knowledge base over the driver's ``documents`` vocabulary.

The driver-provided ``documents`` table (TESTDATA.md) is lowercase
space-separated text, which makes token-anchored gazetteer matching exactly
expressible in ANSI SQL (token equality after ``string_split``).  This KB
pins one entity per chosen vocabulary token so the full KG pipeline can be
validated against a DuckDB oracle end-to-end in ``__spark_entry__``.

Deterministic and shared by the Spark query and the SQL oracle generator —
do not reorder SURFACES (ids are positional, 1-based).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ner_spark.kb.build import KBArtifacts, compile_kb

# token → entity id = index+1.  Types deliberately avoid 'person'/'location'
# so the coref and adjacency machinery is inert (keeps the SQL oracle exact).
SURFACES = ["spark", "customer", "vector", "stream", "window",
            "hash", "merge", "filter"]


def dockb_rows() -> list[dict]:
    return [
        dict(id=i + 1, type="organization" if i % 2 == 0 else "thing",
             name=s, description=f"entity {s}")
        for i, s in enumerate(SURFACES)
    ]


_CACHE: dict[int, KBArtifacts] = {}


def compile_dockb(spark: SparkSession) -> KBArtifacts:
    """Namelist filtering off (lowercase keys are the point here); no
    pronouns/subnames so detected mentions are exactly the SURFACES.
    Memoized per SparkSession — several driver-contract queries share it."""
    key = id(spark)
    if key not in _CACHE:
        _CACHE[key] = compile_kb(spark, dockb_rows(), filter_keys=False,
                                 add_pronouns=False,
                                 add_subname_fragments=False)
    return _CACHE[key]


def surface_case_sql() -> str:
    """SQL CASE mapping token → entity id (mirrors dockb_rows ids)."""
    whens = " ".join(
        f"WHEN '{s}' THEN {i + 1}" for i, s in enumerate(SURFACES))
    return f"CASE tok {whens} END"


def surfaces_in_list_sql() -> str:
    return ", ".join(f"'{s}'" for s in SURFACES)
