"""True 4-bit-storage W4·A8 matmul on XLA's native int4 path.

The TPU replacement for AutoGPTQ's packed qlinear kernels
(`/root/reference/quant/omniquant.py:326-335`, SURVEY.md §2.6 item 1) with
EXACT grouped dequant numerics (same values as `qtensor.dequantize`), at
true 4-bit HBM bytes.

Why this formulation (measured on v5e, libtpu with native S4):

- XLA stores `jnp.int4` arrays PACKED in HBM (verified by allocation) and
  the MXU consumes them at ~2x the int8 element rate; a mixed
  `s8 x s4 -> s32` dot is supported at full rate (0.85 Telem/s measured at
  [14336, 28672] from HBM vs 0.58 for s8 x s8).
- Per-(group, column) scales make a single full-K dot impossible, and
  XLA's *batched* group dots collapse at m=1 (45-74 GB/s measured). The
  fix is the BLOCK-DIAGONAL embedding: place each activation group g in
  columns [g·gs, (g+1)·gs) of row g of a sparse [G, K] matrix — then ONE
  ordinary [B·G, K] @ [K, N] dot yields every per-group partial
  P[b,g,n] = x_{b,g} · W_g with MXU-friendly m = B·G. The G× MAC
  inflation is free: decode is bandwidth-bound by ~25x (224 G MAC/token
  vs 788 TOP/s int4 peak).
- The zero-point correction is exact integer algebra moved out of the hot
  dot: y = s_x · (Σ_g s[g,n]·P[g,n] − Σ_g Σx_{b,g} · s[g,n]·(z[g,n]−off)).
- int4 arrays cannot cross the jit boundary on this backend, so pytree
  leaves stay packed-u8/int8 containers and the container -> int4
  conversion happens in-jit. In a decode loop the conversion MUST be
  hoisted out of the token scan explicitly (`prepare_s4` -> `S4Weight`):
  the layer stack is itself a `lax.scan` over stacked [L, ...] leaves, and
  XLA does not hoist the unpack chain across the two nested scans
  (measured: 52.8 tok/s un-hoisted vs the a8 path's 88.8 — the per-step
  re-conversion reads+writes ~7 GB/step).

Activations are quantized per token to s8 (the same compromise as the a8
serving path, `ops/a8_matmul.py`); the weight math is bit-exact W4 g128.
Also serves 2/3-bit codes (they fit int4; storage is then 4-bit, still
2x denser than the int8 containers).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.qtensor import QuantizedTensor
from . import a8_matmul as _a8
from .a8_matmul import quantize_activations_s8

#: largest token-batch routed through the block-diagonal decode path; above
#: it the batched-group formulation is MXU-efficient on its own
BD_MAX_B = 32

#: K-chunk size for the block-diagonal dot (0 = disabled, the default).
#: Chunking divides the MAC inflation (G rows each spanning full K) by
#: K/BD_KCHUNK exactly — but it is a measured NET LOSS inside the decode
#: layer scan: two-plus dots then consume the same per-layer weight
#: slice, and a dynamic-slice with multiple consumers does not fuse into
#: them — XLA materializes the slice as a full per-layer HBM copy
#: (106 us/layer for gateup; decode collapsed 141 -> 76 tok/s). The
#: ~0.9 ms/step of MAC-inflation savings never covers that. Left as an
#: env knob for single-dispatch (non-scan) contexts.
BD_KCHUNK = int(__import__("os").environ.get("L3Q_BD_KCHUNK", 0))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data4", "scale", "zscale"],
    meta_fields=["bits", "group_size", "k", "n", "out_dtype"],
)
@dataclasses.dataclass
class S4Weight:
    """Decode-prepared quantized weight: codes already int4 (packed HBM),
    zero-point pre-multiplied into `zscale = scale * (zero - off)`.

    Produced in-jit by `prepare_s4` (int4 cannot be a pytree leaf across
    the jit boundary on this backend); `lax.scan` slices the leading layer
    axis of the fields like any pytree."""

    data4: jax.Array  # int4 [..., K, N]
    scale: jax.Array  # f32  [..., G, N]
    zscale: Optional[jax.Array]  # f32 [..., G, N] or None (symmetric)
    bits: int = 4
    group_size: Optional[int] = None
    k: int = 0
    n: int = 0
    out_dtype: jnp.dtype = jnp.bfloat16


def _codes_s4_2d(qt_data, qt):
    if qt.packed:
        from ..quant.pack import unpack_subbyte

        codes = unpack_subbyte(qt_data, qt.bits, qt.k, qt.group_size)
        off = 1 << (qt.bits - 1)
        return (codes.astype(jnp.int8) - off).astype(jnp.int4), off
    return qt_data.astype(jnp.int4), 0


def prepare_s4(qt: QuantizedTensor) -> S4Weight:
    """In-jit: container codes -> int4 + pre-multiplied zero correction.

    Handles stacked leading layer axes on `data`/`scale`/`zero` (the
    transformer stores decoder weights [L, ...] and scans them)."""
    if qt.bits > 4:
        raise ValueError(f"s4 path requires bits <= 4, got {qt.bits}")
    lead = qt.data.ndim - 2
    conv = lambda d: _codes_s4_2d(d, qt)[0]
    for _ in range(lead):
        conv = jax.vmap(conv)
    c4 = conv(qt.data)
    off = (1 << (qt.bits - 1)) if qt.packed else 0
    zscale = qt.scale * (qt.zero - off) if qt.zero is not None else None
    return S4Weight(
        data4=c4,
        scale=qt.scale,
        zscale=zscale,
        bits=qt.bits,
        group_size=qt.group_size,
        k=qt.k,
        n=qt.n,
        out_dtype=qt.out_dtype,
    )


def s4w_matmul(x: jax.Array, w: S4Weight, out_dtype=None) -> jax.Array:
    """`x @ dequant(w)` with 4-bit weight bytes on the native int4 MXU."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2d = x.reshape(-1, w.k)
    b = x2d.shape[0]
    gs = w.group_size or w.k
    g = w.k // gs
    c4, scale, zscale = w.data4, w.scale, w.zscale

    xq, s_x = quantize_activations_s8(x2d)  # [B, K] s8, [B, 1] f32

    if g == 1:
        # no groups: one full-K mixed s8 x s4 dot; very wide N (the s4
        # lm_head recode) takes the K-split matvec — the m=1 dot is
        # element-rate-capped at ~406 Ge/s, K-split streams ~1.09 Te/s
        # (scripts/microbench_head.py)
        if _a8._use_ksplit(b, w.k, w.n):
            acc = _a8.matvec_ksplit(xq, c4, _a8.KSPLIT_G).astype(jnp.float32)
        else:
            acc = jax.lax.dot_general(
                xq, c4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        if zscale is not None:
            xsum = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
            acc = acc * scale[0][None, :] - xsum.astype(jnp.float32) * zscale[0][None, :]
        else:
            acc = acc * scale[0][None, :]
        y = acc * s_x
        return y.astype(out_dtype).reshape(*lead, w.n)

    if b <= BD_MAX_B:
        # block-diagonal embedding: [B*Gc, Kc] s8 @ [Kc, N] s4 -> exact
        # group partials with MXU-friendly m. K is processed in chunks of
        # BD_KCHUNK: each group lives in exactly one chunk, so chunking is
        # exact and divides the G x K x N MAC inflation by the chunk count
        # (down_proj [14336, 4096] G=112 pays ~17 us/layer of inflation
        # un-chunked — m x K x N grows as K^2 N / gs).
        kc = min(BD_KCHUNK, w.k) if BD_KCHUNK else w.k
        if w.k % kc:
            kc = w.k
        gc = kc // gs  # groups per chunk
        rows = jax.lax.broadcasted_iota(jnp.int32, (gc, kc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (gc, kc), 1)
        sel = (cols // gs) == rows  # [Gc, Kc], loop-invariant (hoisted)
        parts = []
        for k0 in range(0, w.k, kc):
            xqc = jax.lax.slice_in_dim(xq, k0, k0 + kc, axis=1)  # [B, Kc]
            c4c = jax.lax.slice_in_dim(c4, k0, k0 + kc, axis=0)  # [Kc, N]
            bd = jnp.where(sel[None], xqc[:, None, :], jnp.int8(0))
            p = jax.lax.dot_general(
                bd.reshape(b * gc, kc), c4c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [B*Gc, N]
            parts.append(p.reshape(b, gc, w.n))
        pf = jnp.concatenate(parts, axis=1).astype(jnp.float32) if len(parts) > 1 \
            else parts[0].astype(jnp.float32)
        y = jnp.einsum("bgn,gn->bn", pf, scale)
    else:
        # prefill/eval regime: batched group dots are efficient at large m
        xg = xq.reshape(b, g, gs)
        cg = c4.reshape(g, gs, w.n)
        parts = jax.lax.dot_general(
            xg, cg, (((2,), (1,)), ((1,), (0,))), preferred_element_type=jnp.int32
        )  # [G, B, N]
        y = jnp.einsum("gbn,gn->bn", parts.astype(jnp.float32), scale)

    if zscale is not None:
        xsum = jnp.sum(
            xq.reshape(b, g, gs).astype(jnp.int32), axis=2
        ).astype(jnp.float32)  # [B, G]
        y = y - xsum @ zscale
    y = y * s_x
    return y.astype(out_dtype).reshape(*lead, w.n)


def s4_matmul(x: jax.Array, qt: QuantizedTensor, out_dtype=None) -> jax.Array:
    """One-shot convenience: prepare + matmul. In decode loops call
    `prepare_s4` ONCE outside the token scan instead (see module docstring)."""
    return s4w_matmul(x, prepare_s4(qt), out_dtype=out_dtype)
