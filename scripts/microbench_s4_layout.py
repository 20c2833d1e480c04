#!/usr/bin/env python
"""Per-shape s4 BD-dot efficiency inside a layer scan, with layout variants.

Round-4 trace: at the decode headline the four fused s4 dots run at
unequal fractions of their ideal bytes — gateup 90%, down 74%, qkv 77%,
o 71% (head 92%). This bench isolates each dot shape in the REAL decode
context (unpack hoisted once per dispatch, then a steps-loop scanning the
[L, ...] stacked weights — one slice consumer per iteration) and measures:

  base : current block-diagonal [B*G, K] s8 @ [K, N] s4 dot
  wT   : transposed weight storage [N, K], contract on the minor dim
  m2x  : BD operand row-duplicated to 2*G rows (is m the limiter?)

Run on the real chip. Prints us/layer-dot and GB/s of ideal codes bytes.
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

L = 32
GS = 128
STEPS = 64  # decode steps per dispatch (amortizes the hoisted unpack)

SHAPES = {  # name -> (K, N)
    "qkv": (4096, 6144),
    "o": (4096, 4096),
    "gateup": (4096, 28672),
    "down": (14336, 4096),
}


def fetch(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def bd_operand(xq, gs):
    b, k = xq.shape
    g = k // gs
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, k), 1)
    sel = (cols // gs) == rows
    bd = jnp.where(sel[None], xq[:, None, :], jnp.int8(0))
    return bd.reshape(b * g, k)


def unpack_k(u8):  # [K/2, N] K-pair container -> int4 [K, N]
    lo = (u8 & 0xF).astype(jnp.int8)
    hi = (u8 >> 4).astype(jnp.int8)
    kk = u8.shape[0] * 2
    return (jnp.stack([lo, hi], axis=1).reshape(kk, -1) - 8).astype(jnp.int4)


def unpack_kT(u8t):  # [N, K/2] K-pair container -> int4 [N, K]
    lo = (u8t & 0xF).astype(jnp.int8)
    hi = (u8t >> 4).astype(jnp.int8)
    n = u8t.shape[0]
    return (jnp.stack([lo, hi], axis=2).reshape(n, -1) - 8).astype(jnp.int4)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}  steps/dispatch: {STEPS}", file=sys.stderr)

    for name, (K, N) in SHAPES.items():
        G = K // GS
        codes = rng.integers(0, 256, (L, K // 2, N), dtype=np.uint8)
        packed = jnp.asarray(codes)                      # [L, K/2, N]
        packedT = jnp.asarray(np.swapaxes(codes, 1, 2).copy())  # [L, N, K/2]
        x = jnp.asarray(rng.integers(-127, 128, (1, K), dtype=np.int8))

        def steps_loop(c4, bd, contract_dim):
            def step(s, acc):
                def body(a, w):
                    p = jax.lax.dot_general(
                        bd + jnp.int8(0) * s.astype(jnp.int8),  # defeat CSE
                        w, (((1,), (contract_dim,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    return a + jnp.sum(p, dtype=jnp.int32), None

                a, _ = jax.lax.scan(body, acc, c4)
                return a

            return jax.lax.fori_loop(0, STEPS, step, jnp.int32(0))

        @jax.jit
        def run_base(x, packed):
            c4 = jax.vmap(unpack_k)(packed)  # [L, K, N] int4 (hoisted)
            return steps_loop(c4, bd_operand(x, GS), 0)

        @jax.jit
        def run_wT(x, packedT):
            c4t = jax.vmap(unpack_kT)(packedT)  # [L, N, K] int4 (hoisted)
            return steps_loop(c4t, bd_operand(x, GS), 1)

        @jax.jit
        def run_m2x(x, packed):
            c4 = jax.vmap(unpack_k)(packed)
            bd = bd_operand(x, GS)
            return steps_loop(c4, jnp.concatenate([bd, bd], axis=0), 0)

        ideal_bytes = K * N / 2  # packed int4 codes per layer
        for vname, fn, arg in (("base", run_base, packed),
                               ("wT", run_wT, packedT),
                               ("m2x", run_m2x, packed)):
            try:
                fetch(fn(x, arg))
            except Exception as e:
                print(f"{name:7s} {vname:5s}: FAILED {repr(e)[:120]}")
                continue
            reps = 3
            best = float("inf")
            for _ in range(4):
                t0 = time.time()
                out = None
                for _ in range(reps):
                    out = fn(x, arg)
                fetch(out)
                best = min(best, (time.time() - t0) / reps)
            per_dot = best / (L * STEPS)
            gbs = ideal_bytes / per_dot / 1e9
            print(f"{name:7s} {vname:5s}: {per_dot*1e6:7.1f} us/layer-dot, "
                  f"{gbs:5.0f} GB/s of codes ({gbs/819:.2f} of bus)",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
