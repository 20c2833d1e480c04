"""Standalone tools (act-stats generation, etc.)."""
