"""On-device (real TPU) parity tests — run with:

    L3Q_TPU_TESTS=1 python -m pytest tests/test_tpu_device.py -q

The CI suite runs on the virtual CPU mesh where Mosaic kernels execute in
interpret mode with an *arithmetic* stand-in for the i8->i4 bitcast; these
tests pin the real Mosaic layout/lowering on hardware (advisor round-3:
"no on-device test pins the bitcast layout, so a Mosaic layout change
would silently garble attention").
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu_device

if os.environ.get("L3Q_TPU_TESTS") != "1":
    pytest.skip(
        "TPU device tests need L3Q_TPU_TESTS=1 (CI runs the CPU mesh)",
        allow_module_level=True,
    )

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if jax.devices()[0].platform != "tpu":
    pytest.skip("no TPU attached", allow_module_level=True)


def test_kv4_bitcast_layout_parity():
    """The int4 flash-decode kernel's core layout assumption — that
    `pltpu.bitcast(uint8 [T/2, D] -> int4 [T, D])` restores `kv4_pack`'s
    low-nibble=even-row order — against eager attention over
    `kv4_dequantize` of the same cache, on the real Mosaic lowering."""
    from llama3_quantization_tpu.ops.decode_attention import flash_decode_gqa_s8
    from llama3_quantization_tpu.ops.kvcache import kv4_dequantize, kv4_pack

    b, g, t, d, rep = 2, 2, 512, 128, 4
    rng = np.random.default_rng(0)
    q = jnp.array(rng.standard_normal((b, 1, g * rep, d)).astype(np.float32))
    codes_k = rng.integers(-8, 8, (b, g, t, d)).astype(np.int8)
    codes_v = rng.integers(-8, 8, (b, g, t, d)).astype(np.int8)
    ks = (rng.random((b, g, t, 1)).astype(np.float32) + 0.5) * 0.02
    vs = (rng.random((b, g, t, 1)).astype(np.float32) + 0.5) * 0.02
    kq = kv4_pack(jnp.array(codes_k))  # [B, G, T/2, D] uint8
    vq = kv4_pack(jnp.array(codes_v))
    # ragged visibility to exercise the mask path
    mask = jnp.where(
        jnp.arange(t)[None, :] < jnp.array([t, t // 2])[:, None], 0.0, -1e30
    ).astype(jnp.float32)

    out = flash_decode_gqa_s8(
        q.astype(jnp.bfloat16), kq, jnp.array(ks), vq, jnp.array(vs), mask,
        out_dtype=jnp.float32, block_t=512,
    )

    kf = np.asarray(kv4_dequantize(kq, jnp.array(ks), dtype=jnp.float32))
    vf = np.asarray(kv4_dequantize(vq, jnp.array(vs), dtype=jnp.float32))
    # eager reference in f64 over the same quantized values
    qg = np.asarray(q, np.float64).reshape(b, g, rep, d)
    s = np.einsum("bgrd,bgtd->bgrt", qg, kf.astype(np.float64)) / np.sqrt(d)
    s = s + np.asarray(mask, np.float64)[:, None, None, :]
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bgrt,bgtd->bgrd", p, vf.astype(np.float64)).reshape(
        b, 1, g * rep, d
    )
    got = np.asarray(out, np.float64)
    # kernel re-quantizes q and probs to int codes (documented compromise);
    # tolerance covers that, not layout errors (a nibble-order break is a
    # catastrophic mismatch, not a 1e-2 one)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-2, f"int4 kernel diverges from dequant reference: {rel}"


def test_s4_grouped_matmul_on_device():
    """The s4 block-diagonal grouped matmul (mixed s8 x int4 MXU dot +
    fused zero epilogue + K-chunking) vs the dequantize oracle on real
    hardware."""
    from llama3_quantization_tpu.ops.s4_matmul import s4_matmul
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.qtensor import dequantize, quantize_rtn

    k, n, gs = 512, 256, 128
    rng = np.random.default_rng(3)
    w = jnp.array(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    x = jnp.array(rng.standard_normal((2, k)).astype(np.float32))
    qt = quantize_rtn(w, QuantSpec(n_bits=4, group_size=gs), pack=True)
    got = np.asarray(
        jax.jit(lambda x: s4_matmul(x, qt, out_dtype=jnp.float32))(x), np.float64
    )
    wd = np.asarray(dequantize(qt, dtype=jnp.float32), np.float64)
    from llama3_quantization_tpu.ops.a8_matmul import quantize_activations_s8

    xq, sx = quantize_activations_s8(x)
    exp = (
        np.asarray(xq, np.float64) @ wd * np.asarray(sx, np.float64)
    )
    rel = np.abs(got - exp).max() / (np.abs(exp).max() + 1e-9)
    assert rel < 5e-6, f"s4 matmul vs oracle on device: {rel}"
