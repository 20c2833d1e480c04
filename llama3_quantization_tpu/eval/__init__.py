"""Evaluation: data pipelines, perplexity, and the task harness."""

from .data import get_loaders, ByteTokenizer, HFTokenizer, SyntheticTokenizer  # noqa: F401
from .ppl import compute_ppl, windowed_nll_fn  # noqa: F401
