"""HQQ — calibration-free half-quadratic quantization.

The reference delegates HQQ to the external `hqq` package
(`/root/reference/quantizehqq.py:36-46`, CUDA/ATen backends). The solver is
pure tensor math, so here it is a jitted JAX transform: alternating
half-quadratic splitting over

    argmin_{q, z}  || W - s·(q - z) ||_p^p   (p < 1, sparsity-promoting)

with auxiliary error e:  W = s·(q − z) + e
  1. q  <- clamp(round((W − e)/s + z))
  2. e  <- generalized soft-threshold of the residual (lp shrinkage)
  3. z  <- mean over group of (q − (W − e)/s)
  4. beta <- beta · kappa

Grouping/storage reuse the framework's packed QuantizedTensor format.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.configs import ModelConfig
from ..models.params import linear_names
from .qtensor import QuantizedTensor, from_codes
from .quantizer import CLIPMIN, QuantSpec


def _shrink_lp(x: jax.Array, beta: float, p: float) -> jax.Array:
    """Generalized soft-threshold for the l_p (p<1) proximal step — the
    `shrink_lp_op` of the hqq package: threshold (1/beta)·|x|^(p-1)."""
    mag = jnp.abs(x)
    thresh = jnp.maximum(
        mag - (1.0 / beta) * jnp.power(jnp.maximum(mag, 1e-8), p - 1.0), 0.0
    )
    return jnp.sign(x) * thresh


@partial(jax.jit, static_argnames=("n_bits", "group_size", "iters", "p"))
def hqq_solve(
    w: jax.Array,  # [K, N]
    n_bits: int,
    group_size: int,
    iters: int = 20,
    p: float = 0.7,
    beta0: float = 10.0,
    kappa: float = 1.01,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (codes uint8 [K, N], scale [G, N], zero [G, N]).

    The zero point starts *rounded* (so the grid keeps an exactly-
    representable zero — crucial for the near-zero weight mass; a continuous
    -wmin/s init is strictly worse than RTN on gaussian-ish weights) and is
    then optimized continuously by the proximal loop.
    """
    k, n = w.shape
    gs = group_size or k
    qmax = 2**n_bits - 1
    wg = w.astype(jnp.float32).reshape(k // gs, gs, n)
    wmin = jnp.min(wg, axis=1, keepdims=True)
    wmax = jnp.max(wg, axis=1, keepdims=True)
    scale = jnp.clip((wmax - wmin) / qmax, CLIPMIN, None)
    zero = jnp.round(-wmin / scale)

    def body(_, carry):
        zero, e, beta = carry
        # the hqq package's optimize_weights_proximal: quantize W directly,
        # shrink the residual, re-center the zero with the error removed
        q = jnp.clip(jnp.round(wg / scale + zero), 0, qmax)
        r = wg - scale * (q - zero)
        e = _shrink_lp(r, beta, p)
        zero = jnp.mean(q - (wg - e) / scale, axis=1, keepdims=True)
        return zero, e, beta * kappa

    zero, e, _ = jax.lax.fori_loop(
        0, iters, body, (zero, jnp.zeros_like(wg), jnp.float32(beta0))
    )
    q = jnp.clip(jnp.round(wg / scale + zero), 0, qmax)
    # final zero is kept continuous (HQQ stores float zeros); round for the
    # packed integer format only at dequant time via float zero support
    codes = q.reshape(k, n).astype(jnp.uint8)
    return codes, scale[:, 0, :], zero[:, 0, :]


def hqq_quantize_weight(
    w: jax.Array, spec: QuantSpec, iters: int = 20, p: float = 0.7, pack: bool = False
) -> QuantizedTensor:
    gs = spec.group_size or w.shape[0]
    if w.shape[0] % gs:
        raise ValueError(f"K={w.shape[0]} not divisible by group_size={gs}")
    codes, scale, zero = hqq_solve(w, spec.n_bits, gs, iters=iters, p=p)
    return from_codes(
        codes,
        scale,
        zero,
        spec,
        pack=pack,
        out_dtype=w.dtype if jnp.issubdtype(w.dtype, jnp.floating) else jnp.bfloat16,
    )


def hqq_quantize_model(
    params,
    cfg: ModelConfig,
    spec: QuantSpec,
    iters: int = 20,
    p: float = 0.7,
    pack: bool = False,
):
    """Calibration-free HQQ over all decoder linears (no data needed — the
    reference's `quantize_llama_model`, `quantizehqq.py:36-46`)."""
    out = dict(params)
    layers = dict(params["layers"])

    def q_one(w):
        return hqq_quantize_weight(w, spec, iters=iters, p=p, pack=pack)

    for name in linear_names(cfg):
        entry = dict(layers[name])
        entry["w"] = jax.vmap(q_one)(entry["w"])
        layers[name] = entry
    if cfg.is_moe:
        # expert stacks [L, E, K, N] carry most MoE parameters
        from ..models.params import MOE_EXPERT_LINEARS

        experts = dict(layers["experts"])
        for name in MOE_EXPERT_LINEARS:
            entry = dict(experts[name])
            entry["w"] = jax.vmap(jax.vmap(q_one))(entry["w"])
            experts[name] = entry
        layers["experts"] = experts
    out["layers"] = layers
    return out
