"""Sources: transcript synthesis + parquet readers."""
