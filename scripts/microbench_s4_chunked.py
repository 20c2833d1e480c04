#!/usr/bin/env python
"""A/B the s4 block-diagonal decode dot against K-chunked variants where
each chunk is a SEPARATE stacked array (one consumer per dynamic-slice —
the round-3 BD_KCHUNK trap was 2+ chunk dots reading the SAME slice).

Scan-driven (inner lax.scan over L stacked layers, outer fori over tokens)
so what is measured is the back-to-back device rate.

Usage: python scripts/microbench_s4_chunked.py [K] [N] [CHUNKS...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

GS = 128


def bd_matvec(xq, c4, scale, gs):
    """One block-diagonal grouped dot: xq s8 [1, Kc], c4 i4 [Kc, N]."""
    kc = xq.shape[-1]
    g = kc // gs
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, kc), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, kc), 1)
    sel = (cols // gs) == rows
    bd = jnp.where(sel, xq, jnp.int8(0))  # [G, Kc]
    p = jax.lax.dot_general(
        bd, c4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [G, N]
    return jnp.einsum("gn,gn->n", p.astype(jnp.float32), scale)[None]


def make_fn(k, n, nchunk, L, steps):
    kc = k // nchunk
    g = k // GS
    gc = kc // GS

    @jax.jit
    def run(xq, chunks, scales, steps):
        def tok(i, acc):
            def layer(carry, ws):
                cs, ss = ws
                y = None
                for ci in range(nchunk):
                    p = bd_matvec(
                        jax.lax.slice_in_dim(carry[None], ci * kc, (ci + 1) * kc, axis=1)[0][None],
                        cs[ci], ss[ci], GS,
                    )
                    y = p if y is None else y + p
                nx = jnp.clip(
                    jnp.tile(y, (1, (k + n - 1) // n))[0, :k] * 1e-3, -120, 120
                ).astype(jnp.int8)
                return nx, ()

            acc, _ = jax.lax.scan(layer, acc, (chunks, scales))
            return acc

        return jax.lax.fori_loop(0, steps, tok, xq)

    return run


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 14336
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    nchunks = [int(x) for x in sys.argv[3:]] or [1, 2, 4, 7]
    L = 8
    steps = 64
    g = k // GS

    rng = np.random.default_rng(0)
    xq = jnp.array(rng.integers(-120, 120, (k,)).astype(np.int8))

    for nchunk in nchunks:
        if k % nchunk or (k // nchunk) % GS:
            print(f"  chunks={nchunk}: skip (K not divisible)")
            continue
        kc = k // nchunk
        gc = kc // GS
        # int4 arrays cannot cross jit; build containers and convert in-jit
        chunks8 = tuple(
            jnp.array(rng.integers(-8, 8, (L, kc, n)).astype(np.int8))
            for _ in range(nchunk)
        )
        scales = tuple(
            jnp.array((rng.random((L, gc, n)).astype(np.float32) + 0.5) * 0.01)
            for _ in range(nchunk)
        )
        run = make_fn(k, n, nchunk, L, steps)

        @jax.jit
        def prep_and_run(xq, chunks8, scales, steps):
            chunks = tuple(c.astype(jnp.int4) for c in chunks8)
            # force the int4 copies to materialize (else XLA fuses the
            # int8->int4 convert into every step's dot, re-reading the
            # containers at 2x the bytes)
            chunks = jax.lax.optimization_barrier(chunks)
            return run(xq, chunks, scales, steps)

        out = prep_and_run(xq, chunks8, scales, steps)
        _ = int(out[0])
        t0 = time.time()
        out = prep_and_run(xq, chunks8, scales, steps)
        _ = int(out[0])
        dt = (time.time() - t0) / steps / L
        gbs = (k * n / 2) / dt / 1e9
        print(
            f"  chunks={nchunk} (m={gc}, MAC x{gc}): {dt*1e6:7.1f} us/call, "
            f"{gbs:5.0f} GB/s packed bytes"
        )


if __name__ == "__main__":
    main()
