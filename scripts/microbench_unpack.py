#!/usr/bin/env python
"""Microbench: packed-W4 unpack formulations for the decode matvec.

Round-1 established (docs/BENCH_NOTES.md) that the v1/v2/v3 kernels all cap
at ~195 GB/s of packed bytes and attributed it to "the VPU shift/mask
unpack". But every round-1 variant widened the packed bytes to i32 before
shifting (`.astype(jnp.int32)`) — paying an i8->i32 sublane relayout plus
i32-lane shifts at 1 element/lane-op — and used per-group K=128 MXU dots
that pay ~50% systolic fill. This script separates those costs:

  a8pc     per-column s8, single full-K dot        (DMA-bound control, ~820)
  a8grp    grouped s8 dots, unpacked s8 codes      (grouped-dot ceiling)
  v2/v3    round-1 kernels                         (baselines)
  u8dot    u8-native lo/hi extract -> 2 s8 dots/group, no widening, no concat
  u8cat    u8-native extract -> sublane concat -> 1 s8 dot/group
  u8bf     u8-native extract -> bf16 convert + dequant -> 1 bf16 dot/group

Usage: python scripts/microbench_unpack.py [K] [N] [reps]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from llama3_quantization_tpu.ops.a8_matmul import a8_matmul, quantize_activations_s8
from llama3_quantization_tpu.ops.pallas_qmatmul import fused_dequant_matmul
from llama3_quantization_tpu.quant import QuantSpec
from llama3_quantization_tpu.quant.qtensor import dequantize, quantize_rtn
from llama3_quantization_tpu.quant.serving import recode_s8_percol

GS = 128
BM = 8


def timeit(fn, *args, reps=100, batches=5):
    out = fn(*args)
    _ = float(jnp.asarray(out).reshape(-1)[0])
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        best = min(best, (time.time() - t0) / reps)
    return best


# ---------------------------------------------------------------------------
# u8-native kernels: packed bytes stay 8-bit through extraction
# ---------------------------------------------------------------------------


def _u8_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, *, variant, gs):
    """x_ref [BM, K] s8; w_ref [K/2, bn] u8 (group-local nibble pack);
    s/z [K/gs, bn] f32. One grid step per N tile, full K resident."""
    bn = w_ref.shape[-1]
    k2 = w_ref.shape[0]
    groups = (k2 * 2) // gs
    sub = gs // 2
    acc = jnp.zeros((BM, bn), jnp.float32)
    xq = x_ref[:]
    for g in range(groups):
        pk = w_ref[g * sub : (g + 1) * sub, :]  # u8 [sub, bn]
        lo = (pk & jnp.uint8(0xF)).astype(jnp.int8)
        hi = jax.lax.shift_right_logical(pk, jnp.uint8(4)).astype(jnp.int8)
        x_lo = xq[:, g * gs : g * gs + sub]
        x_hi = xq[:, g * gs + sub : (g + 1) * gs]
        if variant == "dot2":
            dot_g = jax.lax.dot_general(
                x_lo, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            dot_g += jax.lax.dot_general(
                x_hi, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            xg = jnp.concatenate([x_lo, x_hi], axis=1)
        elif variant == "cat":
            c = jnp.concatenate([lo, hi], axis=0)  # [gs, bn] s8
            xg = xq[:, g * gs : (g + 1) * gs]
            dot_g = jax.lax.dot_general(
                xg, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        else:  # bf16 dequant, 1 dot/group
            sg = s_ref[g, :][None, :].astype(jnp.bfloat16)
            zg = z_ref[g, :][None, :].astype(jnp.bfloat16)
            c = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
            w = (c - zg) * sg
            xg = xq[:, g * gs : (g + 1) * gs].astype(jnp.bfloat16)
            acc += jnp.dot(xg, w, preferred_element_type=jnp.float32)
            continue
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
        sg = s_ref[g, :][None, :]
        zg = z_ref[g, :][None, :]
        acc += (dot_g.astype(jnp.float32) - xsum.astype(jnp.float32) * zg) * sg
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("variant", "bn"))
def u8_qmm(xq, packed_u8, scale, zero, variant="dot2", bn=512):
    k2, n = packed_u8.shape
    k = k2 * 2
    grid = (n // bn,)
    return pl.pallas_call(
        functools.partial(_u8_kernel, variant=variant, gs=GS),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, k), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, bn), lambda h: (0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // GS, bn), lambda h: (0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // GS, bn), lambda h: (0, h), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, bn), lambda h: (0, h), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BM * n * k,
            bytes_accessed=k2 * n + BM * k + BM * n * 4,
            transcendentals=0,
        ),
    )(xq, packed_u8, scale, zero)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 14336
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1), (1, k), jnp.bfloat16)

    spec = QuantSpec(n_bits=4, group_size=GS)
    qt = quantize_rtn(w, spec)
    qt_packed = quantize_rtn(w, spec, pack=True)
    qt_pc = recode_s8_percol(qt)

    xq1, sx1 = quantize_activations_s8(x)
    xq = jnp.broadcast_to(xq1, (BM, k)).copy()
    scale = qt_packed.scale.astype(jnp.float32)
    zero = qt_packed.zero.astype(jnp.float32)
    packed = qt_packed.data  # [K/2, N] (uint8 storage)
    packed_u8 = packed.astype(jnp.uint8) if packed.dtype != jnp.uint8 else packed

    pk_bytes = k // 2 * n
    print(f"shapes: K={k} N={n} packed={pk_bytes/1e6:.1f} MB gs={GS}")

    # numerics check for the u8 kernels vs the fake-quant oracle
    wd = dequantize(qt).astype(jnp.float32)
    oracle = (xq1.astype(jnp.float32) @ wd) * sx1
    for v in ("dot2", "cat", "bf16"):
        got = u8_qmm(xq, packed_u8, scale, zero, variant=v)[0:1] * sx1
        err = float(jnp.max(jnp.abs(got - oracle)) / (jnp.max(jnp.abs(oracle)) + 1e-9))
        print(f"  numerics {v}: rel err {err:.2e}")

    results = {}
    results["a8pc"] = timeit(lambda: a8_matmul(x, qt_pc), reps=reps)
    results["v2"] = timeit(
        lambda: fused_dequant_matmul(x, qt_packed, version=2), reps=reps
    )
    results["v3"] = timeit(
        lambda: fused_dequant_matmul(x, qt_packed, version=3), reps=reps
    )
    for v in ("dot2", "cat", "bf16"):
        results[f"u8_{v}"] = timeit(
            lambda v=v: u8_qmm(xq, packed_u8, scale, zero, variant=v), reps=reps
        )

    print(f"\n{'path':>10} {'us':>9} {'GB/s packed':>12}")
    for name, t in results.items():
        eff_bytes = pk_bytes if name != "a8pc" else k * n
        print(f"{name:>10} {t*1e6:9.1f} {eff_bytes/t/1e9:12.1f}")


if __name__ == "__main__":
    main()
