"""Sources: deterministic transcript synthesis + pruned parquet readers."""
