#!/usr/bin/env python
"""Microbench: lm_head matvec formulations at decode (m=1).

The round-1 finding was that every m<=8 formulation of the [4096, 128256]
head matvec runs at ~456 Ge/s (element-rate-bound, independent of dtype).
But the s4 decoder dots stream at 1.0-1.4 Te/s with m=32-112 via the
block-diagonal group embedding. Hypothesis: the same trick applied to the
head — split K into KB fake groups, place each activation chunk on its own
row (m=KB), one dot, then SUM the partials over rows (no per-group scale;
the per-column scale applies after) — lifts the head past the m=1 cap.

int4 cannot cross the jit boundary on this backend, so each timed fn is
one jitted program: convert once, then `lax.scan` R dots over varying
activations (the real decode structure); conversion amortizes 1/R.

Usage: python scripts/microbench_head.py [d] [vocab] [R]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def run_scan(c8, xs, scale, dtype, kb, r):
    c = c8.astype(dtype) if dtype is not None else c8
    k = c8.shape[0]

    def one(x):
        if kb is None:
            acc = jax.lax.dot_general(
                x, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        else:
            b = x.shape[0]
            g = k // kb
            rows = jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (g, k), 1)
            sel = (cols // kb) == rows
            bd = jnp.where(sel[None], x[:, None, :], jnp.int8(0)).reshape(b * g, k)
            p = jax.lax.dot_general(
                bd, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            acc = jnp.sum(p.reshape(b, g, -1), axis=1)
        return acc.astype(jnp.float32) * scale

    def body(carry, x):
        o = one(x)
        return carry + o[0, :8], None

    out, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), xs, length=r)
    return out


def bench(c8, xs, scale, dtype, kb, r, reps=10):
    f = jax.jit(partial(run_scan, dtype=dtype, kb=kb, r=r))
    out = f(c8, xs, scale)
    _ = float(out[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(c8, xs, scale)
    _ = float(out[0])
    return (time.time() - t0) / reps / r, out


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    v = int(sys.argv[2]) if len(sys.argv) > 2 else 128256
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    rng = np.random.default_rng(0)
    xs = jnp.array(rng.integers(-120, 120, (r, 1, d)).astype(np.int8))
    scale = jnp.array((rng.random((1, v)).astype(np.float32) + 0.5) * 0.01)

    for bits, dtype, lo, hi in ((4, jnp.int4, -7, 7), (8, None, -127, 127)):
        c8 = jnp.array(rng.integers(lo, hi + 1, (d, v)).astype(np.int8))
        c8 = jax.block_until_ready(c8)
        nbytes = d * v * bits // 8
        dt, ref = bench(c8, xs, scale, dtype, None, r)
        print(
            f"int{bits} full-K dot:     {dt*1e6:8.1f} us  "
            f"{nbytes/dt/1e9:7.1f} GB/s  {d*v/dt/1e9:7.1f} Ge/s",
            flush=True,
        )
        for kb in (1024, 512, 256, 128):
            dt, out = bench(c8, xs, scale, dtype, kb, r)
            err = float(jnp.max(jnp.abs(out - ref)))
            print(
                f"int{bits} ksplit m={d//kb:3d}:  {dt*1e6:8.1f} us  "
                f"{nbytes/dt/1e9:7.1f} GB/s  {d*v/dt/1e9:7.1f} Ge/s  maxerr={err:.1e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
