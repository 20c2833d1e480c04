"""Pallas fused dequant-matmul: bit-accuracy vs the XLA dequant path.

Runs in interpreter mode on CPU (the kernel itself is exercised on real TPU
by bench.py; interpret mode checks the same program logic).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.ops.pallas_qmatmul import fused_dequant_matmul
from llama3_quantization_tpu.quant import QuantSpec, dequantize, quantize_rtn


def _ref(x, qt):
    w = dequantize(qt, jnp.float32)
    return np.asarray(x, dtype=np.float32) @ np.asarray(w)


@pytest.mark.parametrize("bits,pack", [(4, True), (2, True), (8, False), (4, False)])
@pytest.mark.parametrize("m", [1, 8, 33])
def test_fused_matches_dequant(rng, bits, pack, m):
    k, n, gs = 256, 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    qt = quantize_rtn(jnp.asarray(w), QuantSpec(n_bits=bits, group_size=gs), pack=pack)
    out = fused_dequant_matmul(jnp.asarray(x), qt, out_dtype=jnp.float32, interpret=True)
    ref = _ref(x, qt)
    # kernel uses bf16 operands on the MXU; tolerance is bf16-level
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max() / 10)


def test_fused_batched_shape(rng):
    k, n = 128, 128
    w = rng.standard_normal((k, n)).astype(np.float32)
    qt = quantize_rtn(jnp.asarray(w), QuantSpec(n_bits=4, group_size=64), pack=True)
    x = jnp.asarray(rng.standard_normal((2, 5, k)).astype(np.float32))
    out = fused_dequant_matmul(x, qt, out_dtype=jnp.float32, interpret=True)
    assert out.shape == (2, 5, n)
    ref = _ref(np.asarray(x).reshape(-1, k), qt).reshape(2, 5, n)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=0.1)


def test_backend_switch(rng):
    from llama3_quantization_tpu.ops import matmul as mm

    k, n = 128, 128
    qt = quantize_rtn(
        jnp.asarray(rng.standard_normal((k, n)).astype(np.float32)),
        QuantSpec(n_bits=4, group_size=64),
        pack=True,
    )
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    y_xla = mm.qmatmul(x, qt)
    assert mm.get_backend() == "xla"
    with mm.backend("pallas"):
        assert mm.get_backend() == "pallas"
    y2 = mm.qmatmul(x, qt)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y2), rtol=1e-5)


def test_pallas_backend_symmetric_falls_back():
    """zero=None (symmetric / serving-recode) tensors must route to XLA
    under the pallas backend instead of crashing the fused kernel."""
    import dataclasses as dc

    from llama3_quantization_tpu.ops.matmul import backend, qmatmul
    from llama3_quantization_tpu.quant.qtensor import dequantize, quantize_rtn
    from llama3_quantization_tpu.quant.quantizer import QuantSpec

    w = jax.random.normal(jax.random.PRNGKey(0), (128, 64), jnp.float32)
    qt = quantize_rtn(w, QuantSpec(n_bits=8, group_size=64))
    qt = dc.replace(qt, zero=None)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 128), jnp.float32)
    with backend("pallas"):
        y = qmatmul(x, qt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ dequantize(qt)), rtol=2e-2, atol=2e-2)


def test_fused_qmm_3bit_planes():
    """In-kernel bit-plane unpack: packed 3-bit fused matmul matches the
    XLA dequant path."""
    from llama3_quantization_tpu.ops.pallas_qmatmul import fused_dequant_matmul
    from llama3_quantization_tpu.quant.qtensor import dequantize, quantize_rtn
    from llama3_quantization_tpu.quant.quantizer import QuantSpec

    w = jax.random.normal(jax.random.PRNGKey(2), (256, 128), jnp.float32)
    qt = quantize_rtn(w, QuantSpec(n_bits=3, group_size=64), pack=True)
    assert qt.packed and qt.bits == 3 and qt.data.shape == (3 * 256 // 8, 128)
    # identity x recovers every dequantized weight row exactly -> proves
    # the in-kernel plane unpack reconstructs the right codes
    eye = jnp.eye(256, dtype=jnp.float32)
    rows = fused_dequant_matmul(eye, qt, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(rows), np.asarray(dequantize(qt)), rtol=2e-2, atol=2e-2
    )
    # random x: accumulation sanity (kernel dequants in bf16; tolerance
    # covers the per-element rounding summed over K)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 256), jnp.float32)
    out = fused_dequant_matmul(x, qt, out_dtype=jnp.float32, interpret=True)
    ref = x @ dequantize(qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-2, atol=0.3)


def test_fused_qmm_3bit_many_groups():
    """3-bit with enough groups to trigger K-tiling + group-axis padding."""
    from llama3_quantization_tpu.ops.pallas_qmatmul import fused_dequant_matmul
    from llama3_quantization_tpu.quant.qtensor import dequantize, quantize_rtn
    from llama3_quantization_tpu.quant.quantizer import QuantSpec

    w = jax.random.normal(jax.random.PRNGKey(4), (1152, 128), jnp.float32)  # 36 groups of 32
    qt = quantize_rtn(w, QuantSpec(n_bits=3, group_size=32), pack=True)
    eye = jnp.eye(1152, dtype=jnp.float32)
    rows = fused_dequant_matmul(eye, qt, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(rows), np.asarray(dequantize(qt)), rtol=2e-2, atol=2e-2
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 1152), jnp.float32)
    out = fused_dequant_matmul(x, qt, out_dtype=jnp.float32, interpret=True)
    ref = x @ dequantize(qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-2, atol=0.6)


def test_retile_non_multiple_group_size():
    """gs>512 with gs%512!=0 must not NaN (re-tiling is skipped)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama3_quantization_tpu.ops.pallas_qmatmul import fused_dequant_matmul
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.qtensor import dequantize, quantize_rtn

    K, N = 1536, 256
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, K), jnp.float32)
    for gs in (768, 512, None):
        qt = quantize_rtn(w, QuantSpec(n_bits=4, group_size=gs), pack=False)
        ref = x @ dequantize(qt)
        out = fused_dequant_matmul(x, qt, interpret=True)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert np.isfinite(rel) and rel < 1e-2, (gs, rel)
