"""Metrics, checkpointing, visualization, and generic helpers."""
