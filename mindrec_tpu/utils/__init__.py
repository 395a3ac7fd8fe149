"""Utilities: profiling, IR dumps, logging."""
