"""The Spark pipeline: mention extraction, triples, canonicalization, lineage."""
