"""Perplexity evaluation — the reference's manual PPL loop, jitted.

Window math identical to `/root/reference/main.py:102-154`: the token stream
is cut into disjoint `seqlen` windows; per window, cross-entropy over the
`seqlen-1` shifted positions is averaged then multiplied by `seqlen`; the
final PPL is `exp(sum(nll) / (nsamples * seqlen))` (the reference's
shift-by-one inside a fixed `seqlen` normalizer is a quirk we must reproduce
for score parity).

TPU-first differences: one compiled step per window shape (not an eager
module traversal), lm_head + CE computed in sequence chunks so the
`[S, vocab]` logits never fully materialize in fp32.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import ModelConfig
from ..models.transformer import NO_QUANT, RuntimeQuantConfig, forward_hidden, lm_head


def _chunked_nll(params, hidden, targets, cfg: ModelConfig, chunk: int) -> jax.Array:
    """Sum of CE(logits[t], targets[t]) over valid (non -100) positions,
    computed `chunk` sequence positions at a time."""
    b, s, _ = hidden.shape
    pad = (-s) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)), constant_values=-100)
    n_chunks = hidden.shape[1] // chunk
    hidden = hidden.reshape(b, n_chunks, chunk, -1).swapaxes(0, 1)
    targets = targets.reshape(b, n_chunks, chunk).swapaxes(0, 1)

    def body(tot, xs):
        h, t = xs
        logits = lm_head(params, h, cfg).astype(jnp.float32)
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        tok_logp = jnp.take_along_axis(
            logits, jnp.clip(t, 0)[..., None], axis=-1
        )[..., 0]
        nll = jnp.where(t >= 0, logz - tok_logp, 0.0)
        return tot + jnp.sum(nll), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), (hidden, targets))
    return total


def windowed_nll_fn(
    cfg: ModelConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
    chunk: int = 512,
) -> Callable:
    """Build the jitted per-window NLL step: tokens [B, S] -> summed shifted
    CE (matching `main.py:137-146`: mean CE over S-1 positions × seqlen)."""

    @partial(jax.jit, static_argnames=())
    def step(params, tokens):
        hidden = forward_hidden(params, tokens, cfg, rq)
        shift_h = hidden[:, :-1, :]
        shift_t = tokens[:, 1:]
        ce_sum = _chunked_nll(params, shift_h, shift_t, cfg, chunk)
        n_valid = shift_t.size
        seqlen = tokens.shape[1]
        # reference: loss.mean() * seqlen
        return ce_sum / n_valid * seqlen

    return step


def sp_windowed_nll_fn(
    cfg: ModelConfig,
    mesh,
    rq: RuntimeQuantConfig = NO_QUANT,
    chunk: int = 512,
) -> Callable:
    """Sequence-parallel per-window NLL step: the trunk runs under ring
    attention with the window sharded over the `sp` mesh axis, so windows
    far beyond the reference's pinned 2048 (`main.py:312`) fit — per-device
    attention stays [S/sp × S/sp]. Same window math as `windowed_nll_fn`.
    """
    from ..parallel.ring_attention import make_sp_forward

    hidden_fn = make_sp_forward(cfg, mesh, rq, return_hidden=True)

    @jax.jit
    def step(params, tokens):
        hidden = hidden_fn(params, tokens)
        ce_sum = _chunked_nll(params, hidden[:, :-1, :], tokens[:, 1:], cfg, chunk)
        return ce_sum / tokens[:, 1:].size * tokens.shape[1]

    return step


def compute_ppl(
    params,
    cfg: ModelConfig,
    testenc: np.ndarray,  # [1, N] token stream
    seqlen: int = 2048,
    rq: RuntimeQuantConfig = NO_QUANT,
    limit: Optional[int] = None,
    step_fn: Optional[Callable] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> float:
    """Reference PPL over disjoint windows (`main.py:122-151`)."""
    testenc = np.asarray(testenc)
    nsamples = testenc.size // seqlen
    if limit is not None:
        nsamples = min(nsamples, limit)
    step = step_fn or windowed_nll_fn(cfg, rq)
    nlls = []
    for i in range(nsamples):
        batch = jnp.asarray(testenc[:, i * seqlen : (i + 1) * seqlen], dtype=jnp.int32)
        nlls.append(step(params, batch))
        if progress:
            progress(i + 1, nsamples)
    total = jnp.sum(jnp.stack(nlls))
    # normalized by the windows actually evaluated; NOTE the reference
    # divides by the FULL window count even under --limit
    # (`main.py:148-151`), silently deflating limited-run PPL — full runs
    # (limit=None) agree exactly
    return float(jnp.exp(total / (nsamples * seqlen)))


def eval_ppl_suite(
    params,
    cfg: ModelConfig,
    streams: Dict[str, np.ndarray],
    seqlen: int = 2048,
    rq: RuntimeQuantConfig = NO_QUANT,
    limit: Optional[int] = None,
) -> Dict[str, float]:
    """PPL across datasets, sharing one compiled step
    (`main.py:102-154`'s wikitext2/c4/ptb loop)."""
    step = windowed_nll_fn(cfg, rq)
    return {
        name: compute_ppl(params, cfg, enc, seqlen, rq, limit, step_fn=step)
        for name, enc in streams.items()
    }
