#!/usr/bin/env python
"""Microbench for the v4 packed-W4 kernel formulation: nibble-packed bytes
DMA'd from HBM, bitcast to int4 in VMEM (free), block-diagonal s4
activations, one int4 MXU dot per K-tile, group scales on accumulators.
The zero-point correction is a tiny [1,G]@[G,N] f32 matmul outside.

Usage: python scripts/microbench_w4_v4.py [K] [N] [BK] [BN]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GS = 128


def split_s8_to_s4(xq32):
    """x = 16*a + b with a, b in [-8, 7]; requires x in [-128, 119]."""
    b = ((xq32 & 15) ^ 8) - 8
    a = (xq32 - b) >> 4
    return a, b


def _v4_kernel(xh_ref, xl_ref, s_ref, w_ref, o_ref, acc_ref, *, bk, bn, nsteps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = bk // GS
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, bk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, bk), 1)
    sel = (cols // GS) == rows
    xh = xh_ref[:].astype(jnp.int32)  # [1, bk]
    xl = xl_ref[:].astype(jnp.int32)
    bd32 = jnp.concatenate(
        [jnp.where(sel, xh, 0), jnp.where(sel, xl, 0)], axis=0
    )  # [2g, bk] i32
    bd = bd32.astype(jnp.int4)
    w4 = pltpu.bitcast(w_ref[:], jnp.int4)  # [bk, bn]
    p = jax.lax.dot_general(
        bd, w4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [2g, bn]
    part = (16 * p[:g, :] + p[g:, :]).astype(jnp.float32)
    acc_ref[:] += jnp.sum(part * s_ref[:], axis=0, keepdims=True)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bk", "bn"))
def v4_matvec(xq, packed, scale, zscale, bk, bn):
    """xq s8 [1, K]; packed i8 [K//2, N]; scale/zscale f32 [K//GS, N]."""
    k2, n = packed.shape
    k = k2 * 2
    g = k // GS
    g_tile = bk // GS
    x32 = jnp.minimum(xq.astype(jnp.int32), 119)
    xh, xl = split_s8_to_s4(x32)
    xsum = jnp.sum(x32.reshape(1, g, GS), axis=2).astype(jnp.float32)  # [1, g]
    corr = xsum @ zscale  # [1, n] f32 — zero-point correction outside kernel
    grid = (n // bn, k // bk)
    main = pl.pallas_call(
        functools.partial(_v4_kernel, bk=bk, bn=bn, nsteps=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bk), lambda h, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda h, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_tile, bn), lambda h, j: (j, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda h, j: (j, h), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda h, j: (0, h), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * g * k * n // (k // bk),
            bytes_accessed=k2 * n + g * n * 4,
            transcendentals=0,
        ),
    )(xh.astype(jnp.int8), xl.astype(jnp.int8), scale, packed)
    return main - corr


def pack_nibbles(codes_signed):
    """codes_signed int8 [K, N] in [-8, 7] -> packed i8 [K//2, N]:
    byte r = (c[2r] & 15) | (c[2r+1] << 4), matching Mosaic's i8->i4 bitcast."""
    c = np.asarray(codes_signed).astype(np.int8)
    lo = c[0::2].astype(np.uint8) & 15
    hi = (c[1::2].astype(np.uint8) & 15) << 4
    return jnp.array((lo | hi).view(np.int8))


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 14336
    bk = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    bn = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    g = k // GS

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, (k, n)).astype(np.int8)
    zero = rng.integers(4, 12, (g, n)).astype(np.float32)
    scale = (rng.random((g, n)).astype(np.float32) + 0.5) * 0.01
    xq = rng.integers(-120, 120, (1, k)).astype(np.int8)

    packed = pack_nibbles(codes - 8)
    zs = scale * (zero - 8.0)
    scale_j = jnp.array(scale)
    zs_j = jnp.array(zs)
    xq_j = jnp.array(xq)

    w = scale[np.repeat(np.arange(g), GS), :] * (
        codes.astype(np.float32) - zero[np.repeat(np.arange(g), GS), :]
    )
    exp = xq.astype(np.float32) @ w

    out = v4_matvec(xq_j, packed, scale_j, zs_j, bk, bn)
    got = np.array(out)
    err = np.abs(got - exp).max() / (np.abs(exp).max() + 1e-9)
    print(f"correctness: max rel err {err:.2e}")

    L = 16
    packs = [jnp.array(np.roll(np.asarray(packed), i, axis=1)) for i in range(L)]
    fn = functools.partial(v4_matvec, bk=bk, bn=bn)
    for _ in range(2):
        outs = [fn(xq_j, p, scale_j, zs_j) for p in packs]
    _ = float(outs[-1][0, 0])
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        outs = [fn(xq_j, p, scale_j, zs_j) for p in packs]
    _ = float(outs[-1][0, 0])
    dt = (time.time() - t0) / reps / L
    gbs = (k * n / 2) / dt / 1e9
    tot = (k * n / 2 + 2 * g * n * 4) / dt / 1e9
    print(f"[{k}x{n}] bk={bk} bn={bn}: {dt*1e6:.1f} us/call, {gbs:.0f} GB/s packed bytes ({tot:.0f} incl scales)")


if __name__ == "__main__":
    main()
