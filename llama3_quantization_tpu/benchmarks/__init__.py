"""Benchmark harnesses: decode latency (see repo-root bench.py) and
multi-device scaling efficiency."""

from .scaling import measure_scaling  # noqa: F401
