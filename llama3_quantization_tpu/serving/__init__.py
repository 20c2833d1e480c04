"""Serving: continuous-batching inference engine."""

from .engine import ServingEngine  # noqa: F401
