"""Pallas TPU kernels for the sparse-embedding hot path."""
