"""Core ops: embedding lookups, sparse utilities, Pallas kernels."""
