#!/usr/bin/env python
"""Scan-based microbench for the v4 packed-W4 Pallas kernel: mimics the
decode loop (inner lax.scan over stacked [L, ...] weights, outer fori over
tokens) so per-dispatch tunnel overhead is excluded and what is measured is
the back-to-back device rate — the number that decides the decode headline.

Usage: python scripts/microbench_w4_scan.py [K] [N] [BK] [BN] [L] [STEPS]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from scripts.microbench_w4_v4 import GS, v4_matvec, pack_nibbles, split_s8_to_s4  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 14336
    bk = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    bn = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    L = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    steps = int(sys.argv[6]) if len(sys.argv) > 6 else 64
    g = k // GS

    rng = np.random.default_rng(0)
    packed = jnp.array(
        rng.integers(-128, 128, (L, k // 2, n)).astype(np.int8)
    )
    scale = jnp.array((rng.random((L, g, n)).astype(np.float32) + 0.5) * 0.01)
    zs = jnp.array(rng.random((L, g, n)).astype(np.float32) * 0.01)
    xq = jnp.array(rng.integers(-120, 120, (1, k)).astype(np.int8))

    mv = functools.partial(v4_matvec, bk=bk, bn=bn)

    @jax.jit
    def run(xq, packed, scale, zs, steps):
        def tok(i, x):
            def layer(carry, w):
                p, s, z = w
                y = mv(carry[:, :k].astype(jnp.int8), p, s, z)
                # fold output back into an s8 activation cheaply (serialize)
                yk = jnp.tile(y, (1, (k + n - 1) // n))[:, :k]
                nx = jnp.clip(yk * 1e-3, -120, 120).astype(jnp.int8)
                return nx, ()
            x, _ = jax.lax.scan(layer, x, (packed, scale, zs))
            return x
        return jax.lax.fori_loop(0, steps, tok, xq)

    out = run(xq, packed, scale, zs, steps)
    _ = float(out[0, 0])
    t0 = time.time()
    out = run(xq, packed, scale, zs, steps)
    _ = float(out[0, 0])
    dt = (time.time() - t0) / steps / L
    gbs = (k * n / 2) / dt / 1e9
    print(
        f"[{k}x{n}] bk={bk} bn={bn} L={L}: {dt*1e6:.1f} us/layer-call, "
        f"{gbs:.0f} GB/s packed bytes"
    )


if __name__ == "__main__":
    main()
