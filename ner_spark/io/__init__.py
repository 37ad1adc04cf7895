"""Table materialization: Iceberg when available, parquet+manifest fallback."""
