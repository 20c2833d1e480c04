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
row axis, group-locally. K tiles are therefore multiples of gs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.pack import pack_factor
from ..quant.qtensor import QuantizedTensor


def _unpack_block(pk_i32: jax.Array, bits: int, groups: int, gs: int, bn: int) -> jax.Array:
    """Unpack an int32 view of packed bytes [bk/f, bn] -> codes [bk, bn].

    pk_i32 is reshaped group-locally: (groups, gs/f, bn); each bit-field s
    contributes the sub-block of rows [s·gs/f, (s+1)·gs/f) of its group.
    """
    f = 8 // bits
    mask = (1 << bits) - 1
    sub = gs // f
    pk = pk_i32.reshape(groups, sub, bn)
    parts = [(pk >> (s * bits)) & mask for s in range(f)]
    return jnp.concatenate(parts, axis=1).reshape(groups * gs, bn)


def _qmm_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, bits, gs, nsteps):
    """Grid = (m_tiles, n_tiles, k_tiles); k innermost, accumulated."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = pack_factor(bits)
    bn = w_ref.shape[-1]
    if f > 1:
        bk = w_ref.shape[0] * f
        groups = bk // gs
        codes = _unpack_block(w_ref[:].astype(jnp.int32), bits, groups, gs, bn)
    else:
        bk = w_ref.shape[0]
        groups = bk // gs
        codes = w_ref[:].astype(jnp.int32)
    codes = codes.reshape(groups, gs, bn).astype(jnp.float32)
    scale = s_ref[:].reshape(groups, 1, bn)
    zero = z_ref[:].reshape(groups, 1, bn)
    w = ((codes - zero) * scale).reshape(groups * gs, bn).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(
    jax.jit, static_argnames=("bits", "gs", "k", "bm", "bn", "bk", "out_dtype", "interpret")
)
def _fused_qmm(
    x2d: jax.Array,  # [M, K]
    data: jax.Array,  # [K/f, N] packed or [K, N] codes
    scale: jax.Array,  # [G, N]
    zero: jax.Array,  # [G, N]
    bits: int,
    gs: int,
    k: int,
    bm: int,
    bn: int,
    bk: int,
    out_dtype,
    interpret: bool = False,
):
    m, n = x2d.shape[0], data.shape[-1]
    f = pack_factor(bits)
    xp = _pad_to(_pad_to(x2d, 0, bm), 1, bk)
    mp, kp = xp.shape
    if kp != k:  # K must already be tile-aligned (enforced by caller)
        raise ValueError(f"K={k} not a multiple of bk={bk}")
    grid = (mp // bm, n // bn, k // bk)
    kernel = functools.partial(
        _qmm_kernel, bits=bits, gs=gs, nsteps=grid[2]
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, h, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // f, bn), lambda i, h, j: (j, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // gs, bn), lambda i, h, j: (j, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // gs, bn), lambda i, h, j: (j, h), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, h, j: (i, h), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=data.size * data.dtype.itemsize + mp * k * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, data, scale, zero)
    return out[:m]


def _choose_tiles(m: int, k: int, n: int, gs: int, f: int):
    bm = 128 if m >= 128 else max(8, 1 << (m - 1).bit_length())
    # K tile: multiple of gs, at least 2 sublane tiles of packed bytes
    bk = gs
    while bk < min(k, 512):
        bk *= 2
    bk = min(bk, k)
    while k % bk:
        bk //= 2
    bn = 256 if n % 256 == 0 else (128 if n % 128 == 0 else n)
    return bm, bn, bk


def fused_dequant_matmul(
    x: jax.Array,
    qt: QuantizedTensor,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Public entry: `x @ dequant(qt)` with x of any leading shape."""
    if qt.zero is None:
        raise NotImplementedError("pallas path requires zero-point storage")
    gs = qt.group_size or qt.k
    if qt.k % gs:
        raise ValueError("K must be a multiple of group_size")
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2d = x.reshape(-1, qt.k)
    f = pack_factor(qt.bits) if qt.packed else 1
    bm, bn, bk = _choose_tiles(x2d.shape[0], qt.k, qt.n, gs, f)
    out = _fused_qmm(
        x2d,
        qt.data,
        qt.scale,
        qt.zero,
        bits=qt.bits if qt.packed else 8,
        gs=gs,
        k=qt.k,
        bm=bm,
        bn=bn,
        bk=bk,
        out_dtype=out_dtype,
        interpret=interpret,
    )
    return out.reshape(*lead, qt.n)
