"""Pallas fused dequant-matmul — the TPU replacement for AutoGPTQ's
qlinear_cuda (SURVEY.md §2.6 item 1).

`y = x @ dequant(Wq)` where Wq is the framework's packed sub-byte format
(`quant/pack.py`): packed bytes stream HBM -> VMEM once, nibbles are
unpacked with VPU shift/mask ops, grouped scales/zeros are applied in VMEM,
and the MXU consumes bf16 tiles with fp32 accumulation. The XLA fallback
(`ops/matmul.py`) materializes the dequantized bf16 weight in HBM every
call — ~4x the bytes at W4 — which is exactly the traffic this kernel
eliminates; decode is HBM-bandwidth-bound, so the saved bytes are the
speedup.

Layout contract (from `quant/pack.py`): within each group of `gs` rows,
packed byte row j of the group holds values {s·(gs/f)+j : s < f} in bit
fields s·bits. Unpack = concat over s of ((b >> s·bits) & mask) along the
row axis, group-locally; K tiles are therefore multiples of gs.

Mosaic tiling constraints shape the schedule:
- scale/zero arrays are too thin for per-k-step (bk/gs, bn) blocks (the
  (8, 128) sublane rule), so they ride along with the FULL group axis and
  are sliced in-kernel at offsets that are provable multiples of 8 — hence
  K tiles are exactly 8 groups (group axis zero-padded to a multiple of 8),
  or the whole K when there are fewer than 8 groups.
- Zero-padding K is sound: the padded x columns are 0, so whatever the
  padded codes dequantize to contributes nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.pack import pack_factor
from ..quant.qtensor import QuantizedTensor

#: groups per K tile when the group axis is split (sublane alignment)
GROUPS_PER_TILE = 8


def _unpack_block(pk_i32: jax.Array, bits: int, groups: int, gs: int, bn: int) -> jax.Array:
    """Unpack an int32 view of packed bytes [bk/f, bn] -> codes [bk, bn]."""
    f = 8 // bits
    mask = (1 << bits) - 1
    sub = gs // f
    pk = pk_i32.reshape(groups, sub, bn)
    parts = [(pk >> (s * bits)) & mask for s in range(f)]
    return jnp.concatenate(parts, axis=1).reshape(groups * gs, bn)


def _qmm_kernel(
    x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, bits, gs, nsteps, packed
):
    """Grid = (m_tiles, n_tiles, k_tiles); k innermost, accumulated."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bn = w_ref.shape[-1]
    if packed and bits == 3:
        # bit-plane storage: w_ref [3, bk/8, bn]; byte row r of plane b
        # holds bit b of codes 8r..8r+7 (`quant/pack.py _pack_planes`)
        bk = w_ref.shape[1] * 8
        groups = bk // gs
        pk = w_ref[:].astype(jnp.int32)
        codes = jnp.zeros((bk, bn), jnp.int32)
        for b in range(3):
            parts = [(pk[b] >> j) & 1 for j in range(8)]
            plane_bits = jnp.stack(parts, axis=1).reshape(bk, bn)
            codes += plane_bits << b
    else:
        f = pack_factor(bits) if packed else 1
        bk = w_ref.shape[0] * f
        groups = bk // gs
        if packed and f > 1:
            codes = _unpack_block(w_ref[:].astype(jnp.int32), bits, groups, gs, bn)
        else:
            codes = w_ref[:].astype(jnp.int32)
    # dequant entirely in bf16: integer codes ≤ 2^8 are exact in bf16, and
    # the scale multiply's bf16 rounding (~2^-8 relative) is far below the
    # quantization step — halving the VMEM intermediate lets tiles be twice
    # as large, which is what amortizes per-tile overhead
    codes = codes.reshape(groups, gs, bn).astype(jnp.bfloat16)
    if nsteps == 1:
        scale = s_ref[:].reshape(groups, 1, bn)
        zero = z_ref[:].reshape(groups, 1, bn)
    else:
        # groups is a multiple of GROUPS_PER_TILE == 8 here, so the offset
        # is provably sublane-aligned
        off = pl.multiple_of(j * groups, GROUPS_PER_TILE)
        scale = s_ref[pl.ds(off, groups), :].reshape(groups, 1, bn)
        zero = z_ref[pl.ds(off, groups), :].reshape(groups, 1, bn)
    w = ((codes - zero.astype(jnp.bfloat16)) * scale.astype(jnp.bfloat16)).reshape(
        groups * gs, bn
    )
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pad_axis(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "gs", "packed", "bm", "bn", "bk", "out_dtype", "interpret", "version"
    ),
)
def _fused_qmm(
    x2d, data, scale, zero, bits, gs, packed, bm, bn, bk, out_dtype,
    interpret=False, version=1,
):
    m = x2d.shape[0]
    n = data.shape[-1]
    plane3 = packed and bits == 3  # [3, K/8, N] bit-plane storage
    f = pack_factor(bits) if packed else 1
    k_pad = data.shape[1] * 8 if plane3 else data.shape[0] * f
    xp = _pad_axis(x2d, 0, -(-m // bm) * bm)
    xp = _pad_axis(xp, 1, k_pad)
    mp = xp.shape[0]
    grid = (mp // bm, n // bn, k_pad // bk)
    kernel_fn = {2: _qmm_v2_kernel, 3: _qmm_v3_kernel}.get(version, _qmm_kernel)
    kernel = functools.partial(
        kernel_fn, bits=bits, gs=gs, nsteps=grid[2], packed=packed
    )
    w_spec = (
        pl.BlockSpec((3, bk // 8, bn), lambda i, h, j: (0, j, h), memory_space=pltpu.VMEM)
        if plane3
        else pl.BlockSpec((bk // f, bn), lambda i, h, j: (j, h), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, h, j: (i, j), memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec(
                (k_pad // gs, bn), lambda i, h, j: (0, h), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_pad // gs, bn), lambda i, h, j: (0, h), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, h, j: (i, h), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k_pad,
            bytes_accessed=data.size * data.dtype.itemsize + mp * k_pad * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, data, scale, zero)
    return out[:m]


def _choose_bm(m: int) -> int:
    return 128 if m >= 128 else max(8, 1 << (m - 1).bit_length())


# ---------------------------------------------------------------------------
# v2 decode kernel: scale-after-matmul
# ---------------------------------------------------------------------------
#
# y_g = s_g · (x_g @ c_g) − s_g z_g · Σ_k x_{g,k}
#
# so the VPU touches each weight element only for shift+mask+cast (the
# group scale/zero apply on the [bm, bn] result — negligible), and each
# bit-field feeds its own MXU dot against the matching static x slice —
# no sublane concat/relayout of unpacked codes.


def _qmm_v2_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, bits, gs, nsteps, packed):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = pack_factor(bits) if packed else 1
    bn = w_ref.shape[-1]
    bk = w_ref.shape[0] * f
    groups = bk // gs
    sub = gs // f
    mask = (1 << bits) - 1 if packed and f > 1 else None

    if nsteps == 1:
        scale = s_ref[:]
        zero = z_ref[:]
    else:
        off = pl.multiple_of(j * groups, GROUPS_PER_TILE)
        scale = s_ref[pl.ds(off, groups), :]
        zero = z_ref[pl.ds(off, groups), :]

    x = x_ref[:].astype(jnp.bfloat16)
    acc = jnp.zeros_like(acc_ref)
    for g in range(groups):
        dot_g = jnp.zeros((x.shape[0], bn), jnp.float32)
        xsum_g = jnp.zeros((x.shape[0], 1), jnp.float32)
        if mask is None:
            cg = w_ref[g * gs : (g + 1) * gs, :].astype(jnp.bfloat16)
            xg = x[:, g * gs : (g + 1) * gs]
            dot_g = jnp.dot(xg, cg, preferred_element_type=jnp.float32)
            xsum_g = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        else:
            pk = w_ref[g * sub : (g + 1) * sub, :].astype(jnp.int32)
            for s in range(f):
                c = ((pk >> (s * bits)) & mask).astype(jnp.bfloat16)
                xs = x[:, g * gs + s * sub : g * gs + (s + 1) * sub]
                dot_g += jnp.dot(xs, c, preferred_element_type=jnp.float32)
                xsum_g += jnp.sum(xs.astype(jnp.float32), axis=1, keepdims=True)
        sg = scale[g, :][None, :]
        zg = zero[g, :][None, :]
        acc += dot_g * sg - xsum_g * (zg * sg)
    acc_ref[:] += acc

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# v3 decode kernel: s8 codes straight to the MXU
# ---------------------------------------------------------------------------
#
# The v1/v2 kernels convert every unpacked code to bf16 before the dot —
# per-element VPU work that caps the weight stream at ~200-340 GB/s. v3
# applies the flash-decode kernel's lesson (`ops/decode_attention.py`) to
# the weight matmul: activations are pre-quantized per token to s8 (the
# same compromise as the a8 serving path), unpacked code bitfields are
# cast i32 -> i8 and contracted with s8 x s8 -> s32 MXU dots, and the
# grouped scale/zero algebra moves to the [bm, bn] output:
#
#   y = qs · Σ_g s_g ⊙ ( Σ_s (xq_{g,s} @ c_{g,s}) − z_g · Σ_k xq_{g,k} )
#
# so the only per-weight-element VPU ops are shift+mask+i8-cast.
#
# MEASURED RESULT (v5e, [4096, 14336] W4 g128, m=1, best-of-5 x300):
# v3 191 GB/s of packed bytes vs v2 196 — i.e. the shift/mask unpack
# itself is the cap, not the bf16 convert or the dot type; and grouped
# a8 (batched per-group s8 dots on int8 containers) reaches only ~353
# GB/s vs ~820 for the per-column single-dot recode. The per-column s8
# recode (`quant/serving.py`) therefore remains the decode fast path;
# v3 stays as the true-W4A8 compute path (grouped W4 numerics with s8
# activations at half the int8-container HBM footprint) and as the
# recorded refutation of the s8-unpack hypothesis (docs/BENCH_NOTES.md).


def _qmm_v3_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, bits, gs, nsteps, packed):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = pack_factor(bits) if packed else 1
    bn = w_ref.shape[-1]
    bk = w_ref.shape[0] * f
    groups = bk // gs
    sub = gs // f
    mask = (1 << bits) - 1 if packed and f > 1 else None

    if nsteps == 1:
        scale = s_ref[:]
        zero = z_ref[:]
    else:
        off = pl.multiple_of(j * groups, GROUPS_PER_TILE)
        scale = s_ref[pl.ds(off, groups), :]
        zero = z_ref[pl.ds(off, groups), :]

    xq = x_ref[:]  # [bm, bk] int8 (pre-quantized per token)
    acc = jnp.zeros_like(acc_ref)
    for g in range(groups):
        if mask is None:
            cg = w_ref[g * gs : (g + 1) * gs, :].astype(jnp.int8)
            xg = xq[:, g * gs : (g + 1) * gs]
            dot_g = jax.lax.dot_general(
                xg, cg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            xsum_g = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
        else:
            pk = w_ref[g * sub : (g + 1) * sub, :].astype(jnp.int32)
            dot_g = jnp.zeros((xq.shape[0], bn), jnp.int32)
            xsum_g = jnp.zeros((xq.shape[0], 1), jnp.int32)
            for s in range(f):
                c = ((pk >> (s * bits)) & mask).astype(jnp.int8)
                xs = xq[:, g * gs + s * sub : g * gs + (s + 1) * sub]
                dot_g += jax.lax.dot_general(
                    xs, c, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                xsum_g += jnp.sum(xs.astype(jnp.int32), axis=1, keepdims=True)
        sg = scale[g, :][None, :]
        zg = zero[g, :][None, :]
        acc += (dot_g.astype(jnp.float32) - xsum_g.astype(jnp.float32) * zg) * sg
    acc_ref[:] += acc

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def fused_dequant_matmul(
    x: jax.Array,
    qt: QuantizedTensor,
    out_dtype=None,
    interpret: bool = False,
    version: int = 0,
):
    """Public entry: `x @ dequant(qt)` with x of any leading shape.

    version 0 = auto: the scale-after-matmul v2 kernel for decode-sized M
    (VPU-bound regime), the concat-dequant v1 kernel for prefill-sized M.
    Override with L3Q_QMM_V=1/2."""
    if qt.zero is None:
        raise NotImplementedError("pallas path requires zero-point storage")
    gs = qt.group_size or qt.k
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2d = x.reshape(-1, qt.k)
    m = x2d.shape[0]

    data, scale, zero = qt.data, qt.scale, qt.zero
    packed = qt.packed
    plane3 = packed and qt.bits == 3
    if plane3:
        data = data.reshape(3, qt.k // 8, qt.n)
        version = 1  # v2's per-bitfield dots assume nibble layout
    f = pack_factor(qt.bits) if packed else 1

    if not packed and gs > 512 and gs % 512 == 0 and qt.k % 512 == 0:
        # unpacked codes have no group-local layout, so large/whole-axis
        # groups can be re-tiled into 512-row synthetic groups (scales
        # replicated) to keep VMEM tiles small. Only when 512 divides gs:
        # otherwise the replicated scale rows would not line up with the
        # synthetic group grid and the kernel would read past them.
        rep = gs // 512
        gs = 512
        scale = jnp.repeat(scale, rep, axis=0)
        zero = jnp.repeat(zero, rep, axis=0)

    g = qt.k // gs
    if g < GROUPS_PER_TILE:
        k_pad = qt.k
        bk = qt.k  # single K step; full group axis in VMEM
    else:
        g_pad = -(-g // GROUPS_PER_TILE) * GROUPS_PER_TILE
        k_pad = g_pad * gs
        if plane3:
            data = _pad_axis(data, 1, k_pad // 8)
        else:
            data = _pad_axis(data, 0, k_pad // f)
        scale = _pad_axis(scale, 0, g_pad)
        zero = _pad_axis(zero, 0, g_pad)
        # pad scale with 1s to avoid 0*0 NaN-adjacent corner in dequant
        if g_pad != g:
            ones = jnp.zeros((g_pad - g, scale.shape[1]), scale.dtype) + 1.0
            scale = scale.at[g:].set(ones)
        bk = GROUPS_PER_TILE * gs

    bm = _choose_bm(m)
    bn = 512 if qt.n % 512 == 0 else (256 if qt.n % 256 == 0 else (128 if qt.n % 128 == 0 else qt.n))
    # Grow bk toward the full (padded) K while the bf16 dequant intermediate
    # + packed tile + codes fit the VMEM budget: fewer, larger tiles beat
    # per-tile overhead (measured: small tiles leave ~10x on the table).
    budget = 10 * 1024 * 1024

    bytes_per_w = 3.0 / 8 if plane3 else 1.0 / f

    def tile_bytes(bk_, bn_):
        # i32 unpack intermediate + bf16 dequant + packed bytes + x tile
        return bk_ * bn_ * (4 + 2 + bytes_per_w) + bm * bk_ * 2

    while bk < k_pad and k_pad % (bk * 2) == 0 and tile_bytes(bk * 2, bn) <= budget:
        bk *= 2
    while tile_bytes(bk, bn) > budget and bn > 128:
        bn //= 2

    if version == 0:
        import os

        env = os.environ.get("L3Q_QMM_V")
        version = int(env) if env else (2 if m <= 64 else 1)

    if version == 3:
        # s8-direct decode path: activations quantized per token (the a8
        # serving compromise), codes stay integer all the way to the MXU
        from .a8_matmul import quantize_activations_s8

        xq, s_x = quantize_activations_s8(x2d)
        out = _fused_qmm(
            xq, data, scale, zero,
            bits=qt.bits, gs=gs, packed=packed,
            bm=bm, bn=bn, bk=bk, out_dtype=jnp.float32,
            interpret=interpret, version=3,
        )
        return (out * s_x).astype(out_dtype).reshape(*lead, qt.n)

    out = _fused_qmm(
        x2d,
        data,
        scale,
        zero,
        bits=qt.bits,
        gs=gs,
        packed=packed,
        bm=bm,
        bn=bn,
        bk=bk,
        out_dtype=out_dtype,
        interpret=interpret,
        version=version,
    )
    return out.reshape(*lead, qt.n)
