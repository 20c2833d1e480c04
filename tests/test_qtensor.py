"""Tests of packing and QuantizedTensor round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.quant import (
    QuantSpec,
    QuantizedTensor,
    fake_quant_dynamic,
    quantize_rtn,
    dequantize,
    pack_subbyte,
    unpack_subbyte,
)


@pytest.mark.parametrize("bits,gs", [(4, 32), (4, None), (2, 32), (8, 32), (3, 32)])
def test_pack_unpack_roundtrip(rng, bits, gs):
    k, n = 64, 16
    q = rng.integers(0, 2**bits, (k, n)).astype(np.uint8)
    packed = pack_subbyte(jnp.asarray(q), bits, gs)
    back = np.asarray(unpack_subbyte(packed, bits, k, gs))
    np.testing.assert_array_equal(back, q)
    if bits in (2, 4):
        assert packed.shape == (k * bits // 8, n)


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("pack", [False, True])
@pytest.mark.parametrize("sym", [False, True])
def test_rtn_matches_fake_quant(rng, bits, pack, sym):
    """Real-quant store + dequant == the reference's dynamic fake-quant."""
    k, n = 64, 24
    w = rng.standard_normal((k, n)).astype(np.float32)
    spec = QuantSpec(n_bits=bits, group_size=32, symmetric=sym, disable_zero_point=sym)
    qt = quantize_rtn(jnp.asarray(w), spec, pack=pack)
    dq = np.asarray(dequantize(qt, jnp.float32))
    # fake-quant reference path operates on the [N, K] view
    want = np.asarray(fake_quant_dynamic(jnp.asarray(w.T), spec)).T
    np.testing.assert_allclose(dq, want, rtol=1e-4, atol=1e-5)


def test_qtensor_is_pytree(rng):
    w = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    qt = quantize_rtn(w, QuantSpec(n_bits=4, group_size=32), pack=True)
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 3  # data, scale, zero

    @jax.jit
    def f(qt, x):
        return x @ dequantize(qt, jnp.float32)

    x = jnp.ones((2, 64), jnp.float32)
    y = f(qt, x)
    assert y.shape == (2, 16)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ np.asarray(dequantize(qt, jnp.float32)), rtol=1e-5
    )


def test_storage_size(rng):
    w = jnp.asarray(rng.standard_normal((128, 32)).astype(np.float32))
    qt = quantize_rtn(w, QuantSpec(n_bits=4, group_size=64), pack=True)
    assert qt.data.dtype == jnp.uint8 and qt.data.shape == (64, 32)
    assert qt.scale.shape == (2, 32)


def test_w16_is_noop_and_guarded(rng):
    import pytest as _pytest

    from llama3_quantization_tpu.models import TINY_LLAMA, forward_logits, init_params, quantize_model_rtn

    cfg = TINY_LLAMA
    import jax as _jax

    params = init_params(cfg, _jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=16))
    toks = _jax.random.randint(_jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    # W16 "quantization" must be bit-identical (SURVEY.md §4 golden check)
    np.testing.assert_array_equal(
        np.asarray(forward_logits(qp, toks, cfg)),
        np.asarray(forward_logits(params, toks, cfg)),
    )
    with _pytest.raises(ValueError):
        quantize_rtn(jnp.ones((32, 8)), QuantSpec(n_bits=16))
    with _pytest.raises(NotImplementedError):
        quantize_rtn(jnp.ones((32, 8)), QuantSpec(n_bits=12))


def test_3bit_plane_packing_roundtrip(rng):
    from llama3_quantization_tpu.quant.pack import packed_rows

    k, n = 64, 16
    q = rng.integers(0, 8, (k, n)).astype(np.uint8)
    packed = pack_subbyte(jnp.asarray(q), 3, 32)
    assert packed.shape == (packed_rows(k, 3), n) == (24, n)  # 3 bits/weight
    back = np.asarray(unpack_subbyte(packed, 3, k, 32))
    np.testing.assert_array_equal(back, q)


def test_3bit_rtn_real_quant_matches_fake(rng):
    k, n = 64, 24
    w = rng.standard_normal((k, n)).astype(np.float32)
    spec = QuantSpec(n_bits=3, group_size=32)
    qt = quantize_rtn(jnp.asarray(w), spec, pack=True)
    assert qt.packed and qt.data.shape[0] == 24
    dq = np.asarray(dequantize(qt, jnp.float32))
    want = np.asarray(fake_quant_dynamic(jnp.asarray(w.T), spec)).T
    np.testing.assert_allclose(dq, want, rtol=1e-4, atol=1e-5)
