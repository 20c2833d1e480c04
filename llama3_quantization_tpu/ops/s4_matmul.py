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
  inflation is mostly free: decode is bandwidth-bound by ~25x, though at
  G=112 (down_proj) the inflation does surface — see `chunks` below.
- The zero-point correction is exact integer algebra fused into the scale
  epilogue: y = s_x · Σ_g s[g,n] · (P[g,n] − Σx_{b,g} · z8[g,n]), with the
  centered zero point stored as ONE int8 byte per (group, column). Round 3
  stored a premultiplied f32 `zscale = s·(z−off)` instead — 4 bytes and a
  separate [1,G]@[G,N] matmul whose operand re-materialized; the fused
  form reads 3 bytes less per (g, n) (~160 MB/step at 8B) and keeps the
  whole correction inside the dot's consumer fusion (round 4, measured).
- `chunks > 1` splits K into separate stacked arrays (NOT slices of one
  array: inside the decode layer scan a dynamic-slice with two-plus
  consumers stops fusing and re-materializes the whole per-layer weight —
  the round-3 BD_KCHUNK trap). Each chunk is its own pytree leaf, sliced
  and consumed exactly once, dividing the G×K×N MAC inflation by the
  chunk count.
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
import os
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..quant.qtensor import QuantizedTensor
from . import a8_matmul as _a8
from .a8_matmul import quantize_activations_s8

#: largest token-batch routed through the block-diagonal decode path; above
#: it the batched-group formulation is MXU-efficient on its own
BD_MAX_B = 32

#: K-chunking policy for the block-diagonal dot: weights whose group count
#: exceeds S4_CHUNK_MAXG are split into `ceil(G / S4_CHUNK_MAXG)` separate
#: stacked arrays at prepare time (one consumer per chunk slice, so the
#: round-3 BD_KCHUNK fusion trap does not apply). Measured on v5e round 4
#: at the decode headline (b1 kv8): off 146.9 tok/s, 2-way down_proj
#: split 146.7, 4-way 133.0 — the G=112 MAC inflation is NOT binding
#: (the MXU overlaps it with the HBM stream) and smaller dots stream
#: worse, so the default is OFF. Set L3Q_S4_CHUNK_MAXG=64/28 to re-test.
S4_CHUNK_MAXG = int(os.environ.get("L3Q_S4_CHUNK_MAXG", 0))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data4", "scale", "zero8"],
    meta_fields=["bits", "group_size", "k", "n", "out_dtype", "chunks"],
)
@dataclasses.dataclass
class S4Weight:
    """Decode-prepared quantized weight: codes already int4 (packed HBM),
    centered zero point as int8 codes (1 byte per (group, column)).

    Produced in-jit by `prepare_s4` (int4 cannot be a pytree leaf across
    the jit boundary on this backend); `lax.scan` slices the leading layer
    axis of the fields like any pytree. `chunks > 1`: `data4` is a tuple
    of K-chunk arrays (each `[..., K/chunks, N]`) so each chunk slice has
    exactly one consumer inside a decode layer scan."""

    data4: Union[jax.Array, Tuple[jax.Array, ...]]  # int4 [..., K, N]
    scale: jax.Array  # f32  [..., G, N]
    zero8: Optional[jax.Array]  # int8 [..., G, N] centered zero, or None
    bits: int = 4
    group_size: Optional[int] = None
    k: int = 0
    n: int = 0
    out_dtype: jnp.dtype = jnp.bfloat16
    chunks: int = 1


def _codes_s4_2d(qt_data, qt):
    if qt.packed:
        from ..quant.pack import unpack_subbyte

        codes = unpack_subbyte(qt_data, qt.bits, qt.k, qt.group_size)
        off = 1 << (qt.bits - 1)
        return (codes.astype(jnp.int8) - off).astype(jnp.int4), off
    return qt_data.astype(jnp.int4), 0


def _pick_chunks(k: int, gs: int, g: int) -> int:
    """Number of K-chunks for the BD dot: split so each chunk has at most
    S4_CHUNK_MAXG groups, preferring divisors of g (exactness requires
    every chunk to hold whole groups)."""
    if not S4_CHUNK_MAXG or g <= S4_CHUNK_MAXG:
        return 1
    for c in range(-(-g // S4_CHUNK_MAXG), g + 1):
        if g % c == 0:
            return c
    return 1


def prepare_s4(qt: QuantizedTensor) -> S4Weight:
    """In-jit: container codes -> int4 + int8 centered zero point.

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
    # qt.zero is integer-valued f32 (minmax_scale_zp rounds it); centered
    # |zero - off| <= 2^(bits-1) fits int8 exactly
    zero8 = (
        jnp.round(qt.zero - off).astype(jnp.int8) if qt.zero is not None else None
    )
    gs = qt.group_size or qt.k
    g = qt.k // gs
    chunks = _pick_chunks(qt.k, gs, g) if qt.group_size else 1
    if chunks > 1:
        kc = qt.k // chunks
        ax = c4.ndim - 2
        data4 = tuple(
            jax.lax.slice_in_dim(c4, i * kc, (i + 1) * kc, axis=ax)
            for i in range(chunks)
        )
    else:
        data4 = c4
    return S4Weight(
        data4=data4,
        scale=qt.scale,
        zero8=zero8,
        bits=qt.bits,
        group_size=qt.group_size,
        k=qt.k,
        n=qt.n,
        out_dtype=qt.out_dtype,
        chunks=chunks,
    )


def _bd_parts(xq: jax.Array, c4: jax.Array, gs: int) -> jax.Array:
    """Block-diagonal grouped partials: xq s8 [B, Kc] -> P [B, Gc, N]."""
    b, kc = xq.shape
    gc = kc // gs
    rows = jax.lax.broadcasted_iota(jnp.int32, (gc, kc), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (gc, kc), 1)
    sel = (cols // gs) == rows  # [Gc, Kc], loop-invariant (hoisted)
    bd = jnp.where(sel[None], xq[:, None, :], jnp.int8(0))
    p = jax.lax.dot_general(
        bd.reshape(b * gc, kc), c4, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B*Gc, N]
    return p.reshape(b, gc, c4.shape[-1])


def s4w_matmul(x: jax.Array, w: S4Weight, out_dtype=None) -> jax.Array:
    """`x @ dequant(w)` with 4-bit weight bytes on the native int4 MXU."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2d = x.reshape(-1, w.k)
    b = x2d.shape[0]
    gs = w.group_size or w.k
    g = w.k // gs
    scale, zero8 = w.scale, w.zero8

    xq, s_x = quantize_activations_s8(x2d)  # [B, K] s8, [B, 1] f32

    if g == 1:
        c4 = w.data4
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
        if zero8 is not None:
            xsum = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
            acc = (
                acc - xsum.astype(jnp.float32) * zero8[0][None, :].astype(jnp.float32)
            ) * scale[0][None, :]
        else:
            acc = acc * scale[0][None, :]
        y = acc * s_x
        return y.astype(out_dtype).reshape(*lead, w.n)

    if b <= BD_MAX_B:
        # block-diagonal embedding: [B*Gc, Kc] s8 @ [Kc, N] s4 -> exact
        # group partials with MXU-friendly m, one dot per K-chunk (each
        # chunk a separate array — see module docstring on the fusion trap)
        if w.chunks > 1:
            kc = w.k // w.chunks
            parts = jnp.concatenate(
                [
                    _bd_parts(
                        jax.lax.slice_in_dim(xq, i * kc, (i + 1) * kc, axis=1),
                        w.data4[i], gs,
                    )
                    for i in range(w.chunks)
                ],
                axis=1,
            )  # [B, G, N]
        else:
            parts = _bd_parts(xq, w.data4, gs)
        pf = parts.astype(jnp.float32)
    else:
        # prefill/eval regime: batched group dots are efficient at large m
        c4 = (
            jnp.concatenate(w.data4, axis=-2) if w.chunks > 1 else w.data4
        )
        xg = xq.reshape(b, g, gs)
        cg = c4.reshape(g, gs, w.n)
        pg = jax.lax.dot_general(
            xg, cg, (((2,), (1,)), ((1,), (0,))), preferred_element_type=jnp.int32
        )  # [G, B, N]
        pf = jnp.swapaxes(pg, 0, 1).astype(jnp.float32)  # [B, G, N]

    # fused epilogue: y = Σ_g s[g,n] · (P[b,g,n] − xsum[b,g] · z8[g,n]) —
    # scale read once, zero read as 1 int8 byte, correction never
    # materialized as its own [G, N] operand
    if zero8 is not None:
        xsum = jnp.sum(
            xq.reshape(b, g, gs).astype(jnp.int32), axis=2
        ).astype(jnp.float32)  # [B, G]
        pf = pf - xsum[:, :, None] * zero8[None].astype(jnp.float32)
    y = jnp.einsum("bgn,gn->bn", pf, scale)
    y = y * s_x
    return y.astype(out_dtype).reshape(*lead, w.n)


def s4_matmul(x: jax.Array, qt: QuantizedTensor, out_dtype=None) -> jax.Array:
    """One-shot convenience: prepare + matmul. In decode loops call
    `prepare_s4` ONCE outside the token scan instead (see module docstring)."""
    return s4w_matmul(x, prepare_s4(qt), out_dtype=out_dtype)
