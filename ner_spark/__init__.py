"""ner_spark — PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-implementation of the capabilities of
KNOT-FIT-BUT/NER (reference at /root/reference, read-only): KB-driven
gazetteer mention detection, entity-link disambiguation, rule coreference,
date detection, triple emission, connected-component canonicalization, and
partitioned materialization with per-partition lineage.

Layout
------
semantics/   pure-Python reference semantics (no Spark imports) — shared by
             the in-repo test oracle and the executor-side pandas UDFs.
kb/          KB compile job: static scores, namelist, broadcast automaton.
pipeline/    the Spark pipeline: mention scan, resolve, triples, lineage.
io/          table catalog (Iceberg if jars present, else parquet+manifest).
textops/     large-scale training-data ops: dedup, quality, lang-id, tokens.
similarity/  embedding ANN: brute-force cosine top-k, LSH buckets.
multimodal/  binary-column plumbing (decode stubbed, schema/batching real).
streaming/   Structured-Streaming wrapper (daemon-mode equivalent).
"""

__version__ = "0.1.0"
