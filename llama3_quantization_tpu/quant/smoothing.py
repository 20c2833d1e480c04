"""Scale/shift migration algebra (SmoothQuant / AWQ / OmniQuant-LET).

Functional equivalent of the reference's `models/transformation.py`: move a
per-channel scale s (and shift δ) across an algebraically-neutral boundary
so activation outliers shrink while weights absorb the range:

    norm(x) @ W  ==  (norm(x)/s) @ (s ⊙ W)            (norm -> linears)
    (x @ Wv) @ Wo ==  (x @ Wv/s) @ (s ⊙ Wo)           (v_proj -> o_proj)
    (q @ s)(k / s)ᵀ == q kᵀ                            (q_proj <-> k_proj)

All weights use the framework's `[K, N]` layout, so "per input channel"
scales broadcast as `scale[:, None]` and "per output channel" as
`scale[None, :]`. Every function is pure: takes entries, returns new ones.
Reference: `models/transformation.py:24-114`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .quantizer import clamp_ste

#: the reference clamps migrated scales into a safe fp16 range through an
#: STE truncation (`models/transformation.py:5-20` + usage at :30-33)
SCALE_MIN = 1e-5
SCALE_MAX = 1e4


def sanitize_scale(s: jax.Array) -> jax.Array:
    """STE-clamped positive scale (gradient flows through the clamp)."""
    return clamp_ste(jnp.abs(s), SCALE_MIN, SCALE_MAX)


def fold_norm_linears(
    norm: Dict[str, jax.Array],
    linears: List[Dict[str, jax.Array]],
    scale: jax.Array,  # [K] per-channel
    shift: Optional[jax.Array] = None,  # [K]
) -> Tuple[Dict[str, jax.Array], List[Dict[str, jax.Array]]]:
    """Migrate (scale, shift) from a norm into the linears it feeds
    (`smooth_ln_fcs_*`, transformation.py:24-44,71-88).

    norm': w/s (bias' = (b - δ)/s); linear': W' = s ⊙ W, b' = b + δ @ W.
    """
    s = sanitize_scale(scale)
    new_norm = dict(norm)
    new_norm["w"] = (norm["w"] / s).astype(norm["w"].dtype)
    if "b" in norm or shift is not None:
        # a shift folded into a bias-free RMSNorm *creates* its bias (the
        # reference's OmniLlamaRMSNorm temp bias, `quant/omni_norm.py:40-63`)
        b = norm.get("b", jnp.zeros_like(norm["w"])) - (
            shift if shift is not None else 0.0
        )
        new_norm["b"] = (b / s).astype(norm["w"].dtype)
    new_linears = []
    for lin in linears:
        w = lin["w"]
        nl = dict(lin)
        nl["w"] = (w * s[:, None].astype(w.dtype)).astype(w.dtype)
        if shift is not None:
            delta = (shift.astype(jnp.float32) @ w.astype(jnp.float32)).astype(w.dtype)
            nl["b"] = (lin.get("b", 0.0) + delta).astype(w.dtype)
        new_linears.append(nl)
    return new_norm, new_linears


def fold_fc_fc(
    fc1: Dict[str, jax.Array],  # producer: out channels scaled down
    fc2: Dict[str, jax.Array],  # consumer: in channels scaled up
    scale: jax.Array,  # [N1] == [K2]
    shift: Optional[jax.Array] = None,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Migrate scale between two chained linears (v_proj -> o_proj;
    `smooth_fc_fc_*`, transformation.py:46-60,90-105)."""
    s = sanitize_scale(scale)
    n1 = dict(fc1)
    n1["w"] = (fc1["w"] / s[None, :].astype(fc1["w"].dtype)).astype(fc1["w"].dtype)
    if "b" in fc1 or shift is not None:
        b1 = fc1.get("b", jnp.zeros(fc1["w"].shape[1], fc1["w"].dtype))
        b1 = (b1 - (shift if shift is not None else 0.0)) / s
        n1["b"] = b1.astype(fc1["w"].dtype)
    n2 = dict(fc2)
    n2["w"] = (fc2["w"] * s[:, None].astype(fc2["w"].dtype)).astype(fc2["w"].dtype)
    if shift is not None:
        delta = (shift.astype(jnp.float32) @ fc2["w"].astype(jnp.float32)).astype(
            fc2["w"].dtype
        )
        n2["b"] = (fc2.get("b", 0.0) + delta).astype(fc2["w"].dtype)
    return n1, n2


def fold_q_k(
    q: Dict[str, jax.Array],
    k: Dict[str, jax.Array],
    scale: jax.Array,  # [Nq] per output channel of q_proj
    head_dim: int = None,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Migrate a per-output-channel scale between q_proj and k_proj
    (`smooth_q_k_*`, transformation.py:62-69,107-114). With GQA the k scale
    is the per-kv-head mean (over the q heads sharing that kv head) of the
    q scale, which requires `head_dim` to regroup the head-major columns —
    approximate unless scales are head-shared (the exact RoPE-safe form
    `omniquant.apply_let` uses)."""
    s = sanitize_scale(scale)
    nq = dict(q)
    nq["w"] = (q["w"] / s[None, :].astype(q["w"].dtype)).astype(q["w"].dtype)
    if "b" in q:
        nq["b"] = (q["b"] / s).astype(q["b"].dtype)
    nk = dict(k)
    if k["w"].shape[1] == q["w"].shape[1]:
        sk = s
    else:
        if head_dim is None:
            raise ValueError("GQA fold_q_k needs head_dim to regroup columns")
        sk = _gqa_reduce(s, k["w"].shape[1], head_dim)
    nk["w"] = (k["w"] * sk[None, :].astype(k["w"].dtype)).astype(k["w"].dtype)
    if "b" in k:
        nk["b"] = (k["b"] * sk).astype(k["b"].dtype)
    return nq, nk


def _gqa_reduce(s: jax.Array, nk: int, head_dim: int) -> jax.Array:
    """Reduce a per-q-column scale [H·hd] to kv columns [Hkv·hd] by
    averaging the q heads that share each kv head, respecting the
    head-major column layout (keeps q·kᵀ invariant only approximately;
    exact invariance requires head-shared scales, which callers should
    use)."""
    rep = s.shape[0] // nk
    if rep == 1:
        return s
    n_kv = nk // head_dim
    return s.reshape(n_kv, rep, head_dim).mean(axis=1).reshape(nk)


def smoothquant_scale(
    act_absmax: jax.Array,  # [K] per-channel activation |max|
    w_absmax: jax.Array,  # [K] per-input-channel weight |max| (over outs)
    alpha: float = 0.5,
) -> jax.Array:
    """SmoothQuant migration strength `s = act^α / w^(1-α)`
    (`quant/omniquant.py:230-252` init formula)."""
    a = jnp.clip(act_absmax.astype(jnp.float32), SCALE_MIN, None)
    w = jnp.clip(w_absmax.astype(jnp.float32), SCALE_MIN, None)
    return jnp.clip((a**alpha) / (w ** (1 - alpha)), SCALE_MIN, SCALE_MAX)


def fold_norm_moe(norm, router, experts, scale, shift=None):
    """Migrate a per-channel scale from the pre-MoE norm into the router and
    every expert's gate/up (`fold_norm_linears` extended to the stacked
    `[E, K, N]` expert layout; the reference has no MoE smoothing at all).

    Scale-only: Mixtral's router and experts are bias-free, so a shift has
    nowhere to fold — callers must keep it zero/None.
    """
    if shift is not None:
        raise ValueError("MoE norm fold is scale-only (experts have no bias)")
    s = sanitize_scale(scale)
    new_norm = dict(norm)
    new_norm["w"] = (norm["w"] / s).astype(norm["w"].dtype)
    if "b" in norm:
        new_norm["b"] = (norm["b"] / s).astype(norm["b"].dtype)
    new_router = dict(router)
    new_router["w"] = (
        router["w"] * s[:, None].astype(router["w"].dtype)
    ).astype(router["w"].dtype)
    new_experts = dict(experts)
    for name in ("gate", "up"):
        entry = dict(new_experts[name])
        w = entry["w"]  # [E, K, N]
        entry["w"] = (w * s[None, :, None].astype(w.dtype)).astype(w.dtype)
        new_experts[name] = entry
    return new_norm, new_router, new_experts
