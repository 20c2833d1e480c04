"""a8 (s8 MXU) matmul path: accuracy vs the dequant reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.ops.a8_matmul import a8_matmul, quantize_activations_s8
from llama3_quantization_tpu.ops import matmul as mm
from llama3_quantization_tpu.quant import QuantSpec, dequantize, quantize_rtn


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("gs", [32, None])
def test_a8_close_to_dequant(rng, bits, gs):
    k, n = 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    x = rng.standard_normal((4, k)).astype(np.float32)
    qt = quantize_rtn(jnp.asarray(w), QuantSpec(n_bits=bits, group_size=gs), pack=False)
    ref = np.asarray(x) @ np.asarray(dequantize(qt, jnp.float32))
    out = np.asarray(a8_matmul(jnp.asarray(x), qt, out_dtype=jnp.float32))
    # a8 adds per-token int8 activation error (~1/127 of |x|max per elem)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 0.05


def test_a8_centered_storage(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    qt = quantize_rtn(jnp.asarray(w), QuantSpec(n_bits=4, group_size=32), pack=False)
    assert qt.data.dtype == jnp.int8
    d = np.asarray(qt.data)
    assert d.min() >= -8 and d.max() <= 7


def test_act_quant_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    xq, s = quantize_activations_s8(x)
    back = np.asarray(xq, np.float32) * np.asarray(s)
    np.testing.assert_allclose(back, np.asarray(x), atol=float(np.abs(np.asarray(x)).max()) / 120)


def test_backend_a8_dispatch(rng):
    qt = quantize_rtn(
        jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
        QuantSpec(n_bits=4, group_size=32), pack=False,
    )
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    y_ref = mm.qmatmul(x, qt)
    with mm.backend("a8"):
        y_a8 = mm.qmatmul(x, qt)
    assert np.abs(np.asarray(y_a8) - np.asarray(y_ref)).max() < 0.2


def test_a8_rejects_packed(rng):
    qt = quantize_rtn(
        jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
        QuantSpec(n_bits=4, group_size=32), pack=True,
    )
    with pytest.raises(ValueError):
        a8_matmul(jnp.ones((2, 64)), qt)


def test_serving_recode_preserves_values(rng):
    from llama3_quantization_tpu.quant.serving import recode_s8_percol

    k, n = 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    qt = quantize_rtn(jnp.asarray(w), QuantSpec(n_bits=4, group_size=32), pack=False)
    w4 = np.asarray(dequantize(qt, jnp.float32))
    r8 = recode_s8_percol(qt)
    assert r8.data.dtype == jnp.int8 and r8.zero is None and r8.group_size is None
    w8 = np.asarray(dequantize(r8, jnp.float32))
    # recode error << W4 quantization error
    recode_err = np.abs(w8 - w4).max()
    w4_err = np.abs(w4 - w).max()
    assert recode_err < w4_err * 0.1


def test_serving_recode_model_forward(rng):
    import jax as _jax
    from llama3_quantization_tpu.models import TINY_LLAMA, forward_logits, init_params, quantize_model_rtn
    from llama3_quantization_tpu.quant.serving import recode_model_s8

    cfg = TINY_LLAMA
    params = init_params(cfg, _jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=32), pack=False)
    rp = recode_model_s8(qp, cfg)
    toks = _jax.random.randint(_jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab_size)
    y_q = forward_logits(qp, toks, cfg)
    with mm.backend("a8"):
        y_r = forward_logits(rp, toks, cfg)
    err = float(jnp.mean(jnp.abs(y_r - y_q)))
    fp_mag = float(jnp.mean(jnp.abs(y_q)))
    assert err < max(fp_mag, 1.0) * 0.1
