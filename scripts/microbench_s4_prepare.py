#!/usr/bin/env python
"""Prepare-chain variants: packed container -> materialized int4 codes.

The s4 decode pays ~33 ms/dispatch (129 us/step at 256) re-materializing
the int4 weight copy in-jit (int4 cannot cross the jit boundary; XLA's
u8->int4 bitcast is MISCOMPILED when feeding a dot — scripts/
microbench_bitcast_s4.py). Variants that still end in a real int4 array
the dots can consume:

  unpack : current chain (shift/mask -> stack -> reshape -> -8 -> int4)
  bc8    : lane-pair container -> bitcast -> reshape -> astype(int8)
           -> astype(int4): pure elementwise converts, no shift/mask
           (the int8 hop forces the DEFINED bitcast semantics; feeding
           the bitcast straight to a dot is the miscompile)
  widen  : unpack via one int16 arithmetic op pair on a [K/2,N] view

Validates each against `unpack` via an int8 fetch, then times the
conversion alone (jit returning a consumer-forced scalar + the int4 kept
alive by a trivial dot so XLA cannot elide the materialization).
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

K, N = 4096, 28672  # gateup-size layer


def fetch(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    centered = rng.integers(-8, 8, (K, N), dtype=np.int8)
    codes = (centered.astype(np.int16) + 8).astype(np.uint8)
    u8k = jnp.asarray((codes[0::2, :] | (codes[1::2, :] << 4)).astype(np.uint8))
    lo = centered[:, 0::2].astype(np.uint8) & 0xF
    hi = centered[:, 1::2].astype(np.uint8) & 0xF
    u8n = jnp.asarray((lo | (hi << 4)).astype(np.uint8))  # lane-pair
    x = jnp.asarray(rng.integers(-127, 128, (8, K), dtype=np.int8))
    dn = (((1,), (0,)), ((), ()))

    def conv_unpack(u8):
        l = (u8 & 0xF).astype(jnp.int8)
        h = (u8 >> 4).astype(jnp.int8)
        return ((jnp.stack([l, h], axis=1).reshape(K, N)) - 8).astype(jnp.int4)

    def conv_bc8(u8):
        c = jax.lax.bitcast_convert_type(u8, jnp.int4).reshape(K, N)
        return c.astype(jnp.int8).astype(jnp.int4)

    def conv_widen(u8):
        # one uint8 op per nibble, no stack: interleave via int16 trick
        u16 = u8.astype(jnp.uint16)
        both = (u16 & 0xF) | ((u16 & 0xF0) << 4)  # [K/2, N] lo | hi<<8
        b2 = jax.lax.bitcast_convert_type(both.astype(jnp.uint16), jnp.uint8)
        # [K/2, N, 2] little-endian: byte0 = lo, byte1 = hi
        c = jnp.swapaxes(b2, 1, 2).reshape(K, N)
        return (c.astype(jnp.int8) - 8).astype(jnp.int4)

    variants = [("unpack", conv_unpack, u8k),
                ("bc8", conv_bc8, u8n),
                ("widen", conv_widen, u8k)]

    ref = None
    timed = []
    for name, conv, arg in variants:
        @jax.jit
        def dotchk(arg, conv=conv):
            c4 = conv(arg)
            return jax.lax.dot_general(x, c4, dn,
                                       preferred_element_type=jnp.int32)
        try:
            out = np.asarray(dotchk(arg))
        except Exception as e:
            print(f"{name}: FAILED {repr(e)[:150]}")
            continue
        if ref is None:
            ref = out
            ok = True
        else:
            ok = (out == ref).all()
        print(f"{name}: {'EXACT' if ok else 'WRONG (%.3f)' % (out != ref).mean()}")
        if ok:
            timed.append((name, conv, arg))

    for name, conv, arg in timed:
        @jax.jit
        def prep(arg, conv=conv):
            c4 = conv(arg)
            # tiny consumer keeps the materialization honest without
            # adding measurable work: sum of one row
            return jnp.sum(c4[0].astype(jnp.int32))

        fetch(prep(arg))
        reps = 20
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            out = None
            for _ in range(reps):
                out = prep(arg)
            fetch(out)
            best = min(best, (time.time() - t0) / reps)
        total_gb = (K * N / 2 * 2) / 1e9  # read packed + write int4
        model_ratio = 3.47e9 / (K * N / 2)  # 8B total codes / this layer
        print(f"{name}: {best*1e6:8.1f} us/layer-conv, "
              f"{total_gb/best:5.0f} GB/s r+w "
              f"(model-scale: {best * model_ratio * 1000:.1f} ms "
              f"per 8B dispatch)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
