"""Sinks: parquet warehouse with append + atomic overwrite-swap."""
