#!/usr/bin/env python
"""A/B the Pallas flash-decode kernel vs the XLA codes-direct attention
(int8 KV), scan-driven. Usage: microbench_attn_xla.py [B] [T] [STEPS]"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from llama3_quantization_tpu.ops.decode_attention import (
    flash_decode_gqa_s8,
    xla_decode_gqa_s8,
)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    g, d, rep = 8, 128, 4

    rng = np.random.default_rng(0)
    q0 = jnp.array(
        rng.standard_normal((b, 1, g * rep, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    kq = jnp.array(rng.integers(-127, 128, (b, g, t, d)).astype(np.int8))
    ks = jnp.array(rng.random((b, g, t, 1)).astype(np.float32) * 0.01 + 0.01)
    vq = jnp.array(rng.integers(-127, 128, (b, g, t, d)).astype(np.int8))
    vs = jnp.array(rng.random((b, g, t, 1)).astype(np.float32) * 0.01 + 0.01)
    mask = jnp.zeros((b, t), jnp.float32)
    bytes_ = 2 * b * g * t * (d + 4)

    for name, fn in (
        ("pallas", partial(flash_decode_gqa_s8, block_t=1024 if t % 1024 == 0 else 512)),
        ("xla", xla_decode_gqa_s8),
    ):
        @jax.jit
        def run(q0, steps, fn=fn):
            def body(i, q):
                o = fn(q, kq, ks, vq, vs, mask)
                return (q + o * 1e-6).astype(q.dtype)
            return jax.lax.fori_loop(0, steps, body, q0)

        o = run(q0, steps)
        _ = float(o.astype(jnp.float32).ravel()[0])
        t0 = time.time()
        o = run(q0, steps)
        _ = float(o.astype(jnp.float32).ravel()[0])
        dt = (time.time() - t0) / steps
        print(
            f"  {name:7s} b{b} T{t}: {dt*1e6:7.1f} us/call, "
            f"{bytes_/dt/1e9:5.0f} GB/s cache stream"
        )

    # parity
    o1 = np.asarray(flash_decode_gqa_s8(q0, kq, ks, vq, vs, mask).astype(jnp.float32))
    o2 = np.asarray(xla_decode_gqa_s8(q0, kq, ks, vq, vs, mask).astype(jnp.float32))
    rel = np.abs(o1 - o2).max() / (np.abs(o1).max() + 1e-9)
    print(f"  parity pallas vs xla: max rel {rel:.2e}")


if __name__ == "__main__":
    main()
