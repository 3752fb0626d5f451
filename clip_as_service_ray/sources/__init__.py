"""Sources: deterministic transcript synthesis + parquet readers."""
