#!/usr/bin/env python
"""Microbench: s4 block-diagonal decoder-dot feed rates at model shapes.

In-model (round 3) the fused s4 dots stream int4 weights at shape-dependent
rates: gateup [4096, 28672] G=32 at ~1.36 Te/s, down [14336, 4096] G=112 at
~1.15 Te/s, o [4096, 4096] at ~0.9-1.1. This isolates each dot and probes:
  - rate vs m (rows of the block-diagonal operand)
  - s8 x s4 vs s4 x s4 (do int4 activations double the feed?)

Each timed program: convert codes to int4 once, lax.scan R dots over
varying activations (conversion amortizes 1/R, matching decode).

Usage: python scripts/microbench_s4dots.py [R]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def run_scan(c8, xs, g, adtype, r):
    c = c8.astype(jnp.int4)
    k, n = c8.shape

    def one(x):  # x: [1, K] int8
        rows = jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (g, k), 1)
        sel = (cols // (k // g)) == rows
        bd = jnp.where(sel, x, jnp.int8(0))  # [G, K]
        if adtype == "s4":
            bd = jnp.clip(bd, -7, 7).astype(jnp.int4)
        p = jax.lax.dot_general(
            bd, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # [G, N]
        return p

    def body(carry, x):
        p = one(x)
        return carry + p[0, :8].astype(jnp.float32), None

    out, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), xs, length=r)
    return out


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    shapes = [
        ("gateup", 4096, 28672, 32),
        ("down", 14336, 4096, 112),
        ("o", 4096, 4096, 32),
        ("qkv", 4096, 6144, 32),
    ]
    for name, k, n, g_model in shapes:
        c8 = jnp.array(rng.integers(-7, 8, (k, n)).astype(np.int8))
        c8 = jax.block_until_ready(c8)
        xs = jnp.array(rng.integers(-120, 120, (r, 1, k)).astype(np.int8))
        nbytes = k * n // 2
        for adtype in ("s8", "s4"):
            for g in sorted({g_model, 8, 16, k // 512}):
                if k % g:
                    continue
                f = jax.jit(partial(run_scan, g=g, adtype=adtype, r=r))
                out = f(c8, xs)
                _ = float(out[0])
                t0 = time.time()
                for _ in range(8):
                    out = f(c8, xs)
                _ = float(out[0])
                dt = (time.time() - t0) / 8 / r
                print(
                    f"{name:7s} [{k:5d},{n:5d}] {adtype} m={g:3d}: "
                    f"{dt*1e6:7.1f} us  {nbytes/dt/1e9:6.1f} GB/s  "
                    f"{k*n/dt/1e12:5.2f} Te/s",
                    flush=True,
                )


if __name__ == "__main__":
    main()
