#!/usr/bin/env python
"""Isolate the cost structure of the v4 packed-W4 Pallas kernel.

Variants (all scan-driven so tunnel dispatch is excluded):
  dma    — DMA the weight block + bitcast, trivial output (bandwidth ceiling)
  dot4   — precomputed block-diagonal i4 activation input, i4 x i4 dot
  bd4    — full v4: build bd in-kernel (i32 where + astype int4), i4 dot
  cast8  — weight i4 -> i8 cast in VMEM, s8 bd with m=G (half the rows)
  scale  — bd4 minus the scale/accumulate epilogue (dot only)

Usage: python scripts/microbench_w4_variants.py [K] [N] [BK] [BN] [variant...]
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


def make_call(kernel, k, n, bk, bn, g, in_specs, scratch=True):
    grid = (n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(kernel, bk=bk, bn=bn, nsteps=grid[1]),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bn), lambda h, j: (0, h), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)] if scratch else [],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n, bytes_accessed=k * n // 2, transcendentals=0
        ),
    )


def spec_w(bk, bn):
    return pl.BlockSpec((bk // 2, bn), lambda h, j: (j, h), memory_space=pltpu.VMEM)


def spec_s(bk, bn):
    return pl.BlockSpec((bk // GS, bn), lambda h, j: (j, h), memory_space=pltpu.VMEM)


# --- dma: pure weight stream, no dot ---------------------------------------
def _dma_kernel(w_ref, o_ref, acc_ref, *, bk, bn, nsteps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w4 = pltpu.bitcast(w_ref[:], jnp.int4)
    acc_ref[:] += jnp.sum(w4[:1, :].astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


# --- dot4: precomputed bd (i8 storage, cast to i4 in kernel), i4 dot -------
def _dot4_kernel(bd_ref, s_ref, w_ref, o_ref, acc_ref, *, bk, bn, nsteps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = bk // GS
    bd = bd_ref[:].astype(jnp.int4)  # [2g, bk] i8 -> i4
    w4 = pltpu.bitcast(w_ref[:], jnp.int4)
    p = jax.lax.dot_general(
        bd, w4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    part = (16 * p[:g, :] + p[g:, :]).astype(jnp.float32)
    acc_ref[:] += jnp.sum(part * s_ref[:], axis=0, keepdims=True)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


# --- bd4: the shipped v4 kernel --------------------------------------------
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
    w4 = pltpu.bitcast(w_ref[:], jnp.int4)
    p = jax.lax.dot_general(
        bd, w4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    part = (16 * p[:g, :] + p[g:, :]).astype(jnp.float32)
    acc_ref[:] += jnp.sum(part * s_ref[:], axis=0, keepdims=True)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


# --- cast8: widen weight to i8, s8 bd with m=G -----------------------------
def _cast8_kernel(bd_ref, s_ref, w_ref, o_ref, acc_ref, *, bk, bn, nsteps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = pltpu.bitcast(w_ref[:], jnp.int4).astype(jnp.int8)  # [bk, bn]
    p = jax.lax.dot_general(
        bd_ref[:], w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc_ref[:] += jnp.sum(p.astype(jnp.float32) * s_ref[:], axis=0, keepdims=True)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


# --- scale: bd4 without the scale epilogue ---------------------------------
def _noscale_kernel(bd_ref, w_ref, o_ref, acc_ref, *, bk, bn, nsteps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = bk // GS
    bd = bd_ref[:].astype(jnp.int4)
    w4 = pltpu.bitcast(w_ref[:], jnp.int4)
    p = jax.lax.dot_general(
        bd, w4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc_ref[:] += jnp.sum(p.astype(jnp.float32), axis=0, keepdims=True)

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
    which = sys.argv[5:] or ["dma", "dot4", "bd4", "cast8", "noscale"]
    g = k // GS
    gt = bk // GS
    L = 8

    rng = np.random.default_rng(0)
    packed = jnp.array(rng.integers(-128, 128, (L, k // 2, n)).astype(np.int8))
    scale = jnp.array((rng.random((L, g, n)).astype(np.float32) + 0.5) * 0.01)
    bd2 = jnp.array(rng.integers(-8, 8, (L, 2 * g, k)).astype(np.int8))
    bd1 = jnp.array(rng.integers(-120, 120, (L, g, k)).astype(np.int8))
    xh = jnp.array(rng.integers(-8, 8, (L, 1, k)).astype(np.int8))
    xl = jnp.array(rng.integers(-8, 8, (L, 1, k)).astype(np.int8))

    print(f"[{k}x{n}] bk={bk} bn={bn} grid=({n//bn},{k//bk})")

    if "dma" in which:
        call = make_call(_dma_kernel, k, n, bk, bn, g, [spec_w(bk, bn)])
        bench("dma", lambda w: call(w), (packed,), k, n)
    if "dot4" in which:
        call = make_call(
            _dot4_kernel, k, n, bk, bn, g,
            [
                pl.BlockSpec((2 * gt, bk), lambda h, j: (0, j), memory_space=pltpu.VMEM),
                spec_s(bk, bn),
                spec_w(bk, bn),
            ],
        )
        # NOTE: bd block indexes rows 0:2gt regardless of j — fine for perf probe
        bench("dot4", lambda b, s, w: call(b[: 2 * gt], s, w), (bd2, scale, packed), k, n)
    if "bd4" in which:
        call = make_call(
            _bd4_kernel, k, n, bk, bn, g,
            [
                pl.BlockSpec((1, bk), lambda h, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk), lambda h, j: (0, j), memory_space=pltpu.VMEM),
                spec_s(bk, bn),
                spec_w(bk, bn),
            ],
        )
        bench("bd4", lambda a, b, s, w: call(a, b, s, w), (xh, xl, scale, packed), k, n)
    if "cast8" in which:
        call = make_call(
            _cast8_kernel, k, n, bk, bn, g,
            [
                pl.BlockSpec((gt, bk), lambda h, j: (0, j), memory_space=pltpu.VMEM),
                spec_s(bk, bn),
                spec_w(bk, bn),
            ],
        )
        bench("cast8", lambda b, s, w: call(b[:gt], s, w), (bd1, scale, packed), k, n)
    if "noscale" in which:
        call = make_call(
            _noscale_kernel, k, n, bk, bn, g,
            [
                pl.BlockSpec((2 * gt, bk), lambda h, j: (0, j), memory_space=pltpu.VMEM),
                spec_w(bk, bn),
            ],
        )
        bench("noscale", lambda b, w: call(b[: 2 * gt], w), (bd2, packed), k, n)


if __name__ == "__main__":
    main()
