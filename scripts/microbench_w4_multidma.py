#!/usr/bin/env python
"""Probe: does splitting the packed weight across S separate input refs
(each its own BlockSpec => own DMA stream) lift the Pallas HBM read rate
past the single-stream ~390 GB/s cap?

Each stream carries K/S rows; kernel does one i4 dot per stream and sums.

Usage: python scripts/microbench_w4_multidma.py [K] [N] [BK] [BN] [S...]
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


def _kernel(*refs, bk, bn, nsteps, nstreams):
    # refs = bd_0..bd_{S-1}, w_0..w_{S-1}, o_ref, acc_ref
    bds = refs[:nstreams]
    ws = refs[nstreams : 2 * nstreams]
    o_ref = refs[2 * nstreams]
    acc_ref = refs[2 * nstreams + 1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tot = None
    for s in range(nstreams):
        bd = bds[s][:].astype(jnp.int4)
        w4 = pltpu.bitcast(ws[s][:], jnp.int4)
        p = jax.lax.dot_general(
            bd, w4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        tot = p if tot is None else tot + p
    acc_ref[:] += jnp.sum(tot.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


def bench(k, n, bk, bn, nstreams, steps=64, L=8):
    ks = k // nstreams  # K rows per stream
    bks = bk // nstreams
    g = bk // GS
    gs_rows = 2 * g // nstreams  # bd rows per stream
    if gs_rows < 1:
        return
    grid = (n // bn, k // bk)

    rng = np.random.default_rng(0)
    ws = [
        jnp.array(rng.integers(-128, 128, (L, ks // 2, n)).astype(np.int8))
        for _ in range(nstreams)
    ]
    bds = [
        jnp.array(rng.integers(-8, 8, (L, gs_rows, ks)).astype(np.int8))
        for _ in range(nstreams)
    ]

    in_specs = [
        pl.BlockSpec((gs_rows, bks), lambda h, j: (0, j), memory_space=pltpu.VMEM)
        for _ in range(nstreams)
    ] + [
        pl.BlockSpec((bks // 2, bn), lambda h, j: (j, h), memory_space=pltpu.VMEM)
        for _ in range(nstreams)
    ]
    call = pl.pallas_call(
        functools.partial(_kernel, bk=bk, bn=bn, nsteps=grid[1], nstreams=nstreams),
        grid=grid,
        in_specs=in_specs,
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

    @jax.jit
    def run(steps, bds, ws):
        def tok(i, acc):
            def layer(carry, xs):
                b, w = xs
                y = call(*b, *w)
                return carry + y[0, :128], ()
            acc, _ = jax.lax.scan(layer, acc, (tuple(bds), tuple(ws)))
            return acc
        return jax.lax.fori_loop(0, steps, tok, jnp.zeros((128,), jnp.float32))

    out = run(steps, bds, ws)
    _ = float(out[0])
    t0 = time.time()
    out = run(steps, bds, ws)
    _ = float(out[0])
    dt = (time.time() - t0) / steps / L
    gbs = (k * n / 2) / dt / 1e9
    print(f"  S={nstreams}: {dt*1e6:7.1f} us/call, {gbs:5.0f} GB/s packed bytes")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 28672
    bk = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    bn = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    streams = [int(x) for x in sys.argv[5:]] or [1, 2, 4]
    print(f"[{k}x{n}] bk={bk} bn={bn}")
    for s in streams:
        bench(k, n, bk, bn, s)


if __name__ == "__main__":
    main()
