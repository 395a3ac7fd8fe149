"""Checkpoint & export IO."""
