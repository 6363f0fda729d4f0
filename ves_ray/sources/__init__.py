"""Input sources: Parquet fragment discovery and schema adapters."""
