"""v2 (scale-after-matmul) kernel accuracy in interpret mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.ops.pallas_qmatmul import fused_dequant_matmul
from llama3_quantization_tpu.quant import QuantSpec, dequantize, quantize_rtn


@pytest.mark.parametrize("bits,pack", [(4, True), (2, True), (8, False), (4, False)])
@pytest.mark.parametrize("m", [1, 8])
def test_v2_matches_dequant(rng, bits, pack, m):
    k, n, gs = 256, 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    qt = quantize_rtn(jnp.asarray(w), QuantSpec(n_bits=bits, group_size=gs), pack=pack)
    out = fused_dequant_matmul(jnp.asarray(x), qt, out_dtype=jnp.float32,
                               interpret=True, version=2)
    ref = np.asarray(x, np.float32) @ np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=np.abs(ref).max() * 2e-3 + 1e-4)


def test_v2_multi_kstep(rng):
    # force the multi-k-step path (G >= 8): K=4096, gs=64 -> 64 groups
    k, n, gs = 1024, 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32)
    x = rng.standard_normal((4, k)).astype(np.float32)
    qt = quantize_rtn(jnp.asarray(w), QuantSpec(n_bits=4, group_size=gs), pack=True)
    out = fused_dequant_matmul(jnp.asarray(x), qt, out_dtype=jnp.float32,
                               interpret=True, version=2)
    ref = np.asarray(x, np.float32) @ np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=np.abs(ref).max() * 2e-3 + 1e-4)


@pytest.mark.parametrize("bits,pack,m", [(4, True, 1), (2, True, 1), (4, True, 8), (8, False, 4)])
def test_v3_matches_s8_oracle(rng, bits, pack, m):
    """v3 (s8-direct) == per-token-s8-quantized x against the dequantized
    weights, exactly (integer dots; only f32 scale algebra after)."""
    from llama3_quantization_tpu.ops.a8_matmul import quantize_activations_s8

    k, n, gs = 1024, 256, 128
    w = rng.standard_normal((k, n)).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    qt = quantize_rtn(jnp.asarray(w), QuantSpec(n_bits=bits, group_size=gs), pack=pack)
    out = fused_dequant_matmul(jnp.asarray(x), qt, out_dtype=jnp.float32,
                               interpret=True, version=3)
    xq, sx = quantize_activations_s8(jnp.asarray(x))
    xr = np.asarray(xq, np.float32) * np.asarray(sx)
    ref = xr @ np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                               atol=np.abs(ref).max() * 1e-5 + 1e-6)
