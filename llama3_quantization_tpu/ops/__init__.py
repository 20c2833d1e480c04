"""Compute ops: quantized matmul dispatch, attention, KV cache."""

from .matmul import qlinear, qmatmul, set_backend, get_backend  # noqa: F401
