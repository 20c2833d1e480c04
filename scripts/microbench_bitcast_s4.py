#!/usr/bin/env python
"""Probe: XLA-level u8 -> int4 bitcast as a FREE decode-time prepare.

Round-4 finding: the s4 decode pays 33 ms/dispatch (129 us/step at 256
steps) of in-jit `prepare_s4` (unpack_subbyte -> -off -> int4 cast) only
because int4 cannot cross the jit boundary on this backend. Hypothesis:
store the weights as a uint8 container of PRE-CENTERED signed nibbles
packed pairwise along N (column 2j in one nibble, 2j+1 in the other) —
then the in-jit prepare is `reshape(lax.bitcast_convert_type(u8, int4))`
which XLA should treat as a view (int4 arrays are stored nibble-packed in
exactly this layout), not a 2x-HBM rewrite.

Measures:
  1. nibble order: which half of the byte becomes element [..., 0];
  2. correctness: bitcast+reshape == the direct int4 codes;
  3. dot speed: s8 @ reshape(bitcast(u8)) vs s8 @ int4-direct, and the
     per-call cost of the bitcast chain when the operand is consumed by
     a dot inside the same jit (the decode situation).
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

K, N = 4096, 14336


def fetch(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    centered = rng.integers(-8, 8, (K, N), dtype=np.int8)  # signed int4 values

    # pack pairs of adjacent N columns: byte j = (col 2j in LOW nibble?)
    lo = centered[:, 0::2].astype(np.uint8) & 0xF
    hi = centered[:, 1::2].astype(np.uint8) & 0xF
    packed_lofirst = (lo | (hi << 4)).astype(np.uint8)  # [K, N/2]
    packed_hifirst = (hi | (lo << 4)).astype(np.uint8)

    u8_lo = jnp.asarray(packed_lofirst)
    u8_hi = jnp.asarray(packed_hifirst)

    @jax.jit
    def unpack(u8):
        c = jax.lax.bitcast_convert_type(u8, jnp.int4)  # [K, N/2, 2]
        # int4 cannot RETURN from jit on this backend (RecursionError) —
        # widen to int8 for the correctness check only
        return c.reshape(K, N).astype(jnp.int8)

    try:
        got = np.asarray(unpack(u8_lo))
    except Exception as e:
        print("bitcast u8->int4 UNSUPPORTED:", repr(e))
        return 1
    if (got == centered).all():
        print("nibble order: LOW nibble first (element 0 = low nibble)")
        u8 = u8_lo
    else:
        got2 = np.asarray(unpack(u8_hi))
        if (got2 == centered).all():
            print("nibble order: HIGH nibble first")
            u8 = u8_hi
        else:
            print("bitcast layout matches NEITHER packing; bail")
            print("sample expected", centered[0, :8], "got(lo)", got[0, :8],
                  "got(hi)", got2[0, :8])
            return 1

    # --- dot speed probe: BD-ish m (B*G = 32 groups at b=1) ---
    # int4 arrays cannot cross the jit boundary at all (device_put of S4
    # wedges), so every variant builds its int4 operand in-jit from a u8
    # leaf; what differs is the conversion chain.
    m = 32
    x = jnp.asarray(rng.integers(-127, 128, (m, K), dtype=np.int8))
    # K-axis packed container (the CURRENT storage): codes 0..15, pairs of
    # K rows per byte, low = even row
    codes = (centered.astype(np.int16) + 8).astype(np.uint8)
    kpacked = (codes[0::2, :] | (codes[1::2, :] << 4)).astype(np.uint8)
    u8k = jnp.asarray(kpacked)  # [K/2, N]

    @jax.jit
    def dot_bitcast(x, u8):
        c4 = jax.lax.bitcast_convert_type(u8, jnp.int4).reshape(K, N)
        return jax.lax.dot_general(
            x, c4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    @jax.jit
    def dot_unpack(x, u8k):
        # the current prepare_s4 chain: shift/mask unpack + center + cast
        lo = (u8k & 0xF).astype(jnp.int8)
        hi = (u8k >> 4).astype(jnp.int8)
        c = jnp.stack([lo, hi], axis=1).reshape(K, N)  # interleave K rows
        c4 = (c - 8).astype(jnp.int4)
        return jax.lax.dot_general(
            x, c4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    a = dot_unpack(x, u8k); fetch(a)
    b = dot_bitcast(x, u8); fetch(b)
    assert (np.asarray(a) == np.asarray(b)).all(), "dot results differ"
    print("dot results identical (bitcast vs unpack-chain)")

    for name, fn, arg in (("bitcast-u8 (new)", dot_bitcast, u8),
                          ("unpack-chain (old, unhoisted)", dot_unpack, u8k)):
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
