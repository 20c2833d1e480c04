#!/usr/bin/env python
"""Micro-benchmark of the quantized matmul paths at a given M.

The decode regime (m=1, HBM-bound) is measured in docs/BENCH_NOTES.md;
this script covers the prefill/eval regime (m=seq, MXU-bound), where the
question flips from "bytes streamed" to "MAC rate": v5e peaks ~197
TFLOP/s bf16 and ~394 TOP/s s8, so an s8x s8 formulation has 2x the
ceiling of any dequant-to-bf16 one.

Usage: python scripts/microbench_qmm.py [M] [K] [N]
Paths: bf16 dense dot (ceiling probe), XLA dequant, pallas v1 (bf16
dequant in-kernel), pallas v3 (s8-direct, grouped W4), a8 per-column
(single s8 dot), a8 grouped (batched group dots -- the decode path).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from llama3_quantization_tpu.quant import QuantSpec
from llama3_quantization_tpu.quant.qtensor import quantize_rtn, dequantize
from llama3_quantization_tpu.quant.serving import recode_s8_percol
from llama3_quantization_tpu.ops.pallas_qmatmul import fused_dequant_matmul
from llama3_quantization_tpu.ops.a8_matmul import a8_matmul


def timeit(fn, *args, reps=50, warmup=2):
    # NOTE: on the axon-tunneled backend block_until_ready returns early;
    # a scalar fetch is the only reliable completion barrier (see bench.py).
    for _ in range(warmup):
        out = fn(*args)
    _ = float(out.reshape(-1)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(out.reshape(-1)[0])
    return (time.time() - t0) / reps


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 14336
    gs = 128
    flops = 2.0 * m * k * n

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)

    spec = QuantSpec(n_bits=4, group_size=gs)
    qt = quantize_rtn(w, spec)               # unpacked int8-container codes
    qt_packed = quantize_rtn(w, spec, pack=True)
    qt_percol = recode_s8_percol(qt)         # per-column symmetric s8
    wb = w.astype(jnp.bfloat16)

    rows = []

    def add(name, fn, *args):
        try:
            dt = timeit(jax.jit(fn), *args)
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} FAILED: {type(e).__name__}: {e}")
            return
        rows.append((name, dt))
        print(f"{name:26s} {dt*1e6:9.1f} us  {flops/dt/1e12:7.1f} TFLOP/s")

    add("bf16 dense dot", lambda a, b: jax.lax.dot(a, b), x, wb)
    add("xla dequant", lambda a, q: jax.lax.dot(a, dequantize(q, jnp.bfloat16)), x, qt)
    add("xla dequant (packed)",
        lambda a, q: jax.lax.dot(a, dequantize(q, jnp.bfloat16)), x, qt_packed)
    add("pallas v1 (packed)",
        lambda a, q: fused_dequant_matmul(a, q, version=1), x, qt_packed)
    add("pallas v3 s8 (packed)",
        lambda a, q: fused_dequant_matmul(a, q, version=3), x, qt_packed)
    add("pallas v3 s8 (unpacked)",
        lambda a, q: fused_dequant_matmul(a, q, version=3), x, qt)
    add("a8 per-column", lambda a, q: a8_matmul(a, q), x, qt_percol)

    # headroom probes: the raw s8 dot ceiling and the act-quant tax
    xq8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
    add("pure s8 dot (s32 out)",
        lambda a, q: jax.lax.dot_general(
            a, q.data, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32), xq8, qt_percol)
    add("s8 dot + f32 scale",
        lambda a, q: jax.lax.dot_general(
            a, q.data, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        * q.scale[0][None, :], xq8, qt_percol)
    if m <= 256:  # [G, B, N] partials explode at prefill M
        add("a8 grouped", lambda a, q: a8_matmul(a, q), x, qt)

    print(f"\nM={m} K={k} N={n} W4 g{gs}; v5e peaks: 197 bf16 / 394 s8 TFLOP/s")


if __name__ == "__main__":
    main()
