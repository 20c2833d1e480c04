#!/usr/bin/env python
"""Probe: block-major (tile-contiguous) weight layout for the v4 kernel.

Weight stored [K/bk, N/bn, bk/2, bn] so each grid step DMAs ONE contiguous
chunk — the hypothesis for the ~390 GB/s cap is strided blocks (the
flash-decode kernel's contiguous cache rows stream ~600 GB/s).

Usage: python scripts/microbench_w4_tiled.py [K] [N] [BK] [BN] [dma|bd4 ...]
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


def _dma_kernel(w_ref, o_ref, acc_ref, *, nsteps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w4 = pltpu.bitcast(w_ref[0, 0], jnp.int4)
    acc_ref[:] += jnp.sum(w4[:1, :].astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _bd4_kernel(xh_ref, xl_ref, s_ref, w_ref, o_ref, acc_ref, *, bk, bn, nsteps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = bk // GS
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, bk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, bk), 1)
    sel = (cols // GS) == rows
    xh = xh_ref[:].astype(jnp.int32)
    xl = xl_ref[:].astype(jnp.int32)
    bd32 = jnp.concatenate([jnp.where(sel, xh, 0), jnp.where(sel, xl, 0)], axis=0)
    bd = bd32.astype(jnp.int4)
    w4 = pltpu.bitcast(w_ref[0, 0], jnp.int4)
    p = jax.lax.dot_general(
        bd, w4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    part = (16 * p[:g, :] + p[g:, :]).astype(jnp.float32)
    acc_ref[:] += jnp.sum(part * s_ref[:], axis=0, keepdims=True)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


def bench(name, fn, args, k, n, steps=64, L=8):
    @jax.jit
    def run(steps, *a):
        def tok(i, acc):
            def layer(carry, w):
                y = fn(*w)
                return carry + y[0, :128], ()
            acc, _ = jax.lax.scan(layer, acc, a)
            return acc
        return jax.lax.fori_loop(0, steps, tok, jnp.zeros((128,), jnp.float32))

    out = run(steps, *args)
    _ = float(out[0])
    t0 = time.time()
    out = run(steps, *args)
    _ = float(out[0])
    dt = (time.time() - t0) / steps / L
    gbs = (k * n / 2) / dt / 1e9
    print(f"  {name:8s}: {dt*1e6:7.1f} us/call, {gbs:5.0f} GB/s packed bytes")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 28672
    bk = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    bn = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    which = sys.argv[5:] or ["dma", "bd4"]
    g = k // GS
    gt = bk // GS
    L = 8
    nk, nn = k // bk, n // bn

    rng = np.random.default_rng(0)
    wt = jnp.array(
        rng.integers(-128, 128, (L, nk, nn, bk // 2, bn)).astype(np.int8)
    )
    scale = jnp.array((rng.random((L, g, n)).astype(np.float32) + 0.5) * 0.01)
    xh = jnp.array(rng.integers(-8, 8, (L, 1, k)).astype(np.int8))
    xl = jnp.array(rng.integers(-8, 8, (L, 1, k)).astype(np.int8))

    print(f"[{k}x{n}] bk={bk} bn={bn} tiled grid=({nn},{nk})")
    grid = (nn, nk)
    spec_wt = pl.BlockSpec(
        (1, 1, bk // 2, bn), lambda h, j: (j, h, 0, 0), memory_space=pltpu.VMEM
    )

    if "dma" in which:
        call = pl.pallas_call(
            functools.partial(_dma_kernel, nsteps=nk),
            grid=grid,
            in_specs=[spec_wt],
            out_specs=pl.BlockSpec((1, bn), lambda h, j: (0, h), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * k * n, bytes_accessed=k * n // 2, transcendentals=0
            ),
        )
        bench("dma", lambda w: call(w), (wt,), k, n)
    if "bd4" in which:
        call = pl.pallas_call(
            functools.partial(_bd4_kernel, bk=bk, bn=bn, nsteps=nk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bk), lambda h, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk), lambda h, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((gt, bn), lambda h, j: (j, h), memory_space=pltpu.VMEM),
                spec_wt,
            ],
            out_specs=pl.BlockSpec((1, bn), lambda h, j: (0, h), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * k * n, bytes_accessed=k * n // 2, transcendentals=0
            ),
        )
        bench("bd4", lambda a, b, s, w: call(a, b, s, w), (xh, xl, scale, wt), k, n)


if __name__ == "__main__":
    main()
