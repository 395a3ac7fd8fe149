"""Data pipeline: Criteo datasets, packed records, streaming sources."""
