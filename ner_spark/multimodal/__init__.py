"""Opaque-binary multimodal columns: typed metadata + batched featurizers."""
