"""Sources & sinks: Parquet warehouse, JSON ingestion, idempotent append."""
