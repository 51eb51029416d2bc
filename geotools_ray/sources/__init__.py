"""Table generators and IO (lance-or-parquet)."""
