"""Utilities: logging, profiling, timing."""

from .logger import create_logger  # noqa: F401
from .profiling import profile_trace, Throughput  # noqa: F401
