"""Uniform affine quantizer — the scalar math core of the framework.

Functional JAX re-design of the reference's `UniformAffineQuantizer`
(`/root/reference/quant/quantizer.py:23-165`). Same numerics (min/max dynamic
calibration, asymmetric zero-point rounding, scale clipping to [1e-5, 1e4],
group reshape with zero padding, learnable weight clipping through a sigmoid,
straight-through-estimator rounding) so quantized scores are comparable, but:

- no module state: `(scale, zero_point)` are explicit values returned by
  `minmax_scale_zp` and threaded through pytrees;
- group handling is shape-polymorphic over leading axes (the reference only
  supports 2-D weights);
- STE is a `jax.custom_jvp` so it is correct under both `jit` and `grad`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

CLIPMIN = 1e-5
CLIPMAX = 1e4


@jax.custom_jvp
def round_ste(x: jax.Array) -> jax.Array:
    """Round with a straight-through gradient (identity in the backward pass).

    Reference: `quant/quantizer.py:15-19`.
    """
    return jnp.round(x)


@round_ste.defjvp
def _round_ste_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return jnp.round(x), dx


@jax.custom_jvp
def clamp_ste(x: jax.Array, lo: float, hi: float) -> jax.Array:
    """Clamp with straight-through gradient (reference `truncate_number` uses
    a detach-trick for the same purpose, `models/transformation.py:5-20`)."""
    return jnp.clip(x, lo, hi)


@clamp_ste.defjvp
def _clamp_ste_jvp(primals, tangents):
    x, lo, hi = primals
    dx = tangents[0]
    return jnp.clip(x, lo, hi), dx


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of a quantization scheme.

    Mirrors the constructor flags of the reference quantizer
    (`quant/quantizer.py:24-83`). Hashable so it can be a static jit arg.
    """

    n_bits: int = 8
    symmetric: bool = False
    #: per-group quantization along the last axis; None = whole-axis (per
    #: channel for weights / per token for activations).
    group_size: Optional[int] = None
    #: signed integer range without a zero point (reference
    #: `disable_zero_point`, used for weights in the mlc-llm / sym path).
    disable_zero_point: bool = False
    #: learnable weight clipping (OmniQuant LWC) — when True, callers pass
    #: sigmoid-bounded clipping logits to the calibration functions.
    lwc: bool = False
    #: 16-bit softmax passthrough metric (reference `metric="fix0to1"`).
    metric: str = "minmax"

    def __post_init__(self):
        if not (1 <= self.n_bits <= 16):
            raise ValueError(f"bitwidth {self.n_bits} not supported")

    @property
    def qmin(self) -> int:
        if self.disable_zero_point:
            return -(2 ** (self.n_bits - 1))
        return 0

    @property
    def qmax(self) -> int:
        if self.disable_zero_point:
            return 2 ** (self.n_bits - 1) - 1
        return 2**self.n_bits - 1

    @property
    def enabled(self) -> bool:
        return self.n_bits < 16


def _group_reshape(x: jax.Array, group_size: int) -> Tuple[jax.Array, int]:
    """Reshape (..., d) -> (..., ceil(d/gs), gs), zero-padding the tail.

    The reference calls the pad amount "deficiency"
    (`quant/quantizer.py:95-97,133-139`). Returns (grouped, pad)."""
    d = x.shape[-1]
    pad = (-d) % group_size
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x.reshape(*x.shape[:-1], -1, group_size), pad


def minmax_scale_zp(
    x: jax.Array,
    spec: QuantSpec,
    lwc_up: Optional[jax.Array] = None,
    lwc_low: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Dynamic min/max calibration -> (scale, round_zero_point).

    Matches `per_token_dynamic_calibration` (`quant/quantizer.py:132-159`):
    reduction over the last axis (per token / per channel), or over groups of
    the last axis when `spec.group_size` is set. `lwc_up`/`lwc_low` are the
    LWC logits (pre-sigmoid), broadcastable to the reduced shape.

    Returned arrays KEEP the reduced axis (keepdims=True) so they broadcast
    against the grouped view of x.
    """
    if spec.group_size:
        x, _ = _group_reshape(x, spec.group_size)
    xmin = jnp.min(x, axis=-1, keepdims=True)
    xmax = jnp.max(x, axis=-1, keepdims=True)
    if spec.lwc:
        if lwc_up is None or lwc_low is None:
            raise ValueError("LWC spec requires lwc_up/lwc_low logits")
        xmax = jax.nn.sigmoid(lwc_up) * xmax
        xmin = jax.nn.sigmoid(lwc_low) * xmin
    return scale_zp_from_minmax(xmin, xmax, spec)


def scale_zp_from_minmax(
    xmin: jax.Array, xmax: jax.Array, spec: QuantSpec
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """(scale, round_zero_point) from already-reduced min/max statistics.

    The tail of `per_token_dynamic_calibration`
    (`/root/reference/quant/quantizer.py:140-159`), split out so callers
    that know the row statistics without materializing the row — e.g. ring
    attention's softmax-probs quantization, where max = 1/l and
    min = exp(min_score - m)/l fall out of the online-softmax stats — can
    produce bit-identical parameters."""
    if spec.symmetric or spec.disable_zero_point:
        abs_max = jnp.maximum(jnp.abs(xmax), jnp.abs(xmin))
        scale = abs_max / (2 ** (spec.n_bits - 1) - 1)
        scale = jnp.clip(scale, CLIPMIN, CLIPMAX)
        if spec.disable_zero_point:
            zp = None
        else:
            # reference keeps a constant zero point of 2^(n-1)-1 in the
            # symmetric-with-zero-point path (`quant/quantizer.py:150`)
            zp = jnp.full_like(scale, 2 ** (spec.n_bits - 1) - 1)
    else:
        scale = (xmax - xmin) / (2**spec.n_bits - 1)
        scale = jnp.clip(scale, CLIPMIN, CLIPMAX)
        zp = jnp.round(jnp.clip(-xmin / scale, -CLIPMAX, CLIPMAX))
    return scale, zp


def fake_quant(
    x: jax.Array,
    scale: jax.Array,
    round_zp: Optional[jax.Array],
    spec: QuantSpec,
) -> jax.Array:
    """Quantize-dequantize with given parameters (reference `fake_quant`,
    `quant/quantizer.py:94-115`). Differentiable through STE."""
    orig_shape = x.shape
    if spec.group_size:
        x, pad = _group_reshape(x, spec.group_size)
    x_int = round_ste(x / scale)
    if round_zp is not None:
        x_int = x_int + round_zp
    # plain clamp (zero gradient outside the grid), matching the reference's
    # `.clamp` (`quant/quantizer.py:106`) — saturated elements must NOT pass
    # gradient to LWC logits through the value path; clamp_ste stays for the
    # smoothing algebra's truncate_number, which IS a straight-through clamp
    x_int = jnp.clip(x_int, float(spec.qmin), float(spec.qmax))
    x_dq = x_int - round_zp if round_zp is not None else x_int
    x_dq = x_dq * scale
    if spec.group_size:
        x_dq = x_dq.reshape(*orig_shape[:-1], -1)
        if pad:
            x_dq = x_dq[..., : orig_shape[-1]]
    return x_dq


def fake_quant_dynamic(
    x: jax.Array,
    spec: QuantSpec,
    lwc_up: Optional[jax.Array] = None,
    lwc_low: Optional[jax.Array] = None,
) -> jax.Array:
    """Dynamic-calibration fake quant: the reference quantizer's `forward`
    (`quant/quantizer.py:118-130`). Used for activation quantization and for
    calibration-time weight fake-quant."""
    if not spec.enabled:
        return x
    if spec.metric == "fix0to1":
        # 16-bit softmax passthrough (`quant/quantizer.py:121-122`)
        levels = 2**spec.n_bits - 1
        return jnp.round(x * levels) / levels
    scale, zp = minmax_scale_zp(x, spec, lwc_up, lwc_low)
    return fake_quant(x, scale, zp, spec)


LWC_INIT = 4.0  # reference init of clipping logits (`quant/quantizer.py:68`)


def lwc_init(weight_shape: Tuple[int, ...], spec: QuantSpec) -> dict:
    """Initial LWC logits for a weight of the given shape.

    Shapes follow the keepdims convention of `minmax_scale_zp`: per output
    channel (group_size None) -> (rows, 1); grouped -> (rows, n_groups, 1).
    Reference: `quant/quantizer.py:69-79`.
    """
    rows, cols = weight_shape
    if spec.group_size:
        n_groups = -(-cols // spec.group_size)
        shape = (rows, n_groups, 1)
    else:
        shape = (rows, 1)
    return {
        "up": jnp.full(shape, LWC_INIT, jnp.float32),
        "low": jnp.full(shape, LWC_INIT, jnp.float32),
    }
