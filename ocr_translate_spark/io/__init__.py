"""Table IO: snapshot-committed warehouse over parquet (Iceberg when available)."""
