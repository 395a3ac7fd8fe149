"""Version info for mindrec_tpu."""

__version__ = "0.1.0"
