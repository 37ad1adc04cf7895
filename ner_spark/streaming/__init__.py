"""Structured-Streaming wrapper — the reference's daemon mode (SURVEY S2)."""
