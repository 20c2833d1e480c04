#!/usr/bin/env python
"""Probe 2: correct-and-fast formulations of the u8->int4 bitcast feed.

Probe 1 (microbench_bitcast_s4.py) found `reshape(bitcast(u8[K,N/2]))`
feeding a dot gives WRONG numbers (the standalone conversion is exact;
through the dot ~100% of outputs mismatch) — int4 tiles pack pairs of
SUBLANE rows per byte, and the lane-minor reshape's logical/physical
disagreement appears to miscompile. Test the formulations that respect
the sublane packing:

  B. u8[K/2, N] -> bitcast -> [K/2, N, 2] -> transpose(0,2,1) -> reshape
     [K, N]  (logical row interleave; XLA may or may not see it as free)
  E. no reshape of the int4 at all: dot_general with TWO contracting dims
     y[m,n] = sum_{r,t} x[m,r,t] * w[r,n,t] on w=[K/2, N, 2], x viewed
     [m, K/2, 2] (free view for s8).
  D. int8 full-size container -> astype(int4), hoisted (reference chain,
     half-rate read).

Each is validated THROUGH the dot against the in-jit unpack-chain result
before timing.
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

K, N = 4096, 14336
m = 32
dn = (((1,), (0,)), ((), ()))


def fetch(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    centered = rng.integers(-8, 8, (K, N), dtype=np.int8)
    x = jnp.asarray(rng.integers(-127, 128, (m, K), dtype=np.int8))

    # K-pair container: byte (r, n) = rows (2r low, 2r+1 high)
    lo = centered[0::2, :].astype(np.uint8) & 0xF
    hi = centered[1::2, :].astype(np.uint8) & 0xF
    u8kpair = jnp.asarray((lo | (hi << 4)).astype(np.uint8))  # [K/2, N]
    # reference: current unpack chain from the same container
    codes = (centered.astype(np.int16) + 8).astype(np.uint8)
    u8old = jnp.asarray((codes[0::2, :] | (codes[1::2, :] << 4)).astype(np.uint8))
    s8full = jnp.asarray(centered)  # int8 [K, N] container for D

    @jax.jit
    def dot_ref(x, u8k):
        l = (u8k & 0xF).astype(jnp.int8)
        h = (u8k >> 4).astype(jnp.int8)
        c4 = ((jnp.stack([l, h], axis=1).reshape(K, N)) - 8).astype(jnp.int4)
        return jax.lax.dot_general(x, c4, dn, preferred_element_type=jnp.int32)

    @jax.jit
    def dot_B(x, u8):
        c = jax.lax.bitcast_convert_type(u8, jnp.int4)  # [K/2, N, 2]
        c4 = jnp.transpose(c, (0, 2, 1)).reshape(K, N)
        return jax.lax.dot_general(x, c4, dn, preferred_element_type=jnp.int32)

    @jax.jit
    def dot_E(x, u8):
        c = jax.lax.bitcast_convert_type(u8, jnp.int4)  # [K/2, N, 2]
        x3 = x.reshape(m, K // 2, 2)
        return jax.lax.dot_general(
            x3, c, (((1, 2), (0, 2)), ((), ())),
            preferred_element_type=jnp.int32)

    @jax.jit
    def dot_D(x, s8):
        c4 = s8.astype(jnp.int4)
        return jax.lax.dot_general(x, c4, dn, preferred_element_type=jnp.int32)

    ref = np.asarray(dot_ref(x, u8old))
    cands = [("B transpose-reshape", dot_B, u8kpair),
             ("E two-contract", dot_E, u8kpair),
             ("D int8->int4 cast", dot_D, s8full)]
    good = []
    for name, fn, arg in cands:
        try:
            out = np.asarray(fn(x, arg))
        except Exception as e:
            print(f"{name}: FAILED to run: {repr(e)[:200]}")
            continue
        ok = (out == ref).all()
        print(f"{name}: {'EXACT' if ok else 'WRONG (%.3f mismatch)' % (out != ref).mean()}")
        if ok:
            good.append((name, fn, arg))

    good.append(("ref unpack-chain", dot_ref, u8old))
    for name, fn, arg in good:
        reps = 200
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            out = None
            for _ in range(reps):
                out = fn(x, arg)
            fetch(out)
            best = min(best, (time.time() - t0) / reps)
        gbs = (K * N / 2) / best / 1e9
        print(f"{name}: {best*1e6:.1f} us/call, {gbs:.0f} GB/s of packed bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
