"""Deterministic synthetic fixtures (FIXTURES.md): pages corpus + KB."""
