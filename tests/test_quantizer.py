"""Unit tests of the uniform affine quantizer vs NumPy oracles.

Mirrors the reference semantics of `/root/reference/quant/quantizer.py` —
the oracle below is an independent NumPy transcription of the published
OmniQuant math (min/max calibration, scale clip, asym zero-point rounding).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.quant import (
    QuantSpec,
    fake_quant_dynamic,
    minmax_scale_zp,
    fake_quant,
    lwc_init,
    round_ste,
)


def numpy_fake_quant(x, n_bits, symmetric=False, group_size=None, disable_zp=False):
    """Oracle: per-row (or per-group) dynamic min/max affine fake-quant."""
    orig = x.shape
    if group_size:
        pad = (-x.shape[-1]) % group_size
        if pad:
            x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        x = x.reshape(*x.shape[:-1], -1, group_size)
    xmin = x.min(-1, keepdims=True)
    xmax = x.max(-1, keepdims=True)
    if symmetric or disable_zp:
        absmax = np.maximum(np.abs(xmin), np.abs(xmax))
        scale = np.clip(absmax / (2 ** (n_bits - 1) - 1), 1e-5, 1e4)
        zp = None if disable_zp else np.full_like(scale, 2 ** (n_bits - 1) - 1)
        qmin, qmax = (
            (-(2 ** (n_bits - 1)), 2 ** (n_bits - 1) - 1)
            if disable_zp
            else (0, 2**n_bits - 1)
        )
    else:
        scale = np.clip((xmax - xmin) / (2**n_bits - 1), 1e-5, 1e4)
        zp = np.round(np.clip(-xmin / scale, -1e4, 1e4))
        qmin, qmax = 0, 2**n_bits - 1
    q = np.round(x / scale)
    if zp is not None:
        q = q + zp
    q = np.clip(q, qmin, qmax)
    dq = (q - zp) * scale if zp is not None else q * scale
    if group_size:
        dq = dq.reshape(*orig[:-1], -1)[..., : orig[-1]]
    return dq


@pytest.mark.parametrize("n_bits", [2, 3, 4, 8])
@pytest.mark.parametrize("symmetric,disable_zp", [(False, False), (True, False), (True, True)])
@pytest.mark.parametrize("group_size", [None, 32])
def test_fake_quant_matches_oracle(rng, n_bits, symmetric, disable_zp, group_size):
    x = rng.standard_normal((16, 96)).astype(np.float32)
    spec = QuantSpec(
        n_bits=n_bits,
        symmetric=symmetric,
        disable_zero_point=disable_zp,
        group_size=group_size,
    )
    got = np.asarray(fake_quant_dynamic(jnp.asarray(x), spec))
    want = numpy_fake_quant(x, n_bits, symmetric, group_size, disable_zp)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_16bit_passthrough(rng):
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    spec = QuantSpec(n_bits=16)
    np.testing.assert_array_equal(np.asarray(fake_quant_dynamic(x, spec)), np.asarray(x))


def test_fix0to1_metric():
    x = jnp.asarray([[0.0, 0.124, 0.5, 1.0]])
    spec = QuantSpec(n_bits=4, metric="fix0to1")
    got = np.asarray(fake_quant_dynamic(x, spec))
    np.testing.assert_allclose(got, np.round(np.asarray(x) * 15) / 15, rtol=1e-6)


def test_quant_error_bounded_by_half_step(rng):
    """|x - fq(x)| <= scale/2 wherever x is inside the clip range."""
    x = rng.standard_normal((8, 64)).astype(np.float32)
    spec = QuantSpec(n_bits=4, group_size=16)
    scale, zp = minmax_scale_zp(jnp.asarray(x), spec)
    dq = np.asarray(fake_quant(jnp.asarray(x), scale, zp, spec))
    step = np.asarray(scale).reshape(8, 4).repeat(16, axis=-1)
    assert np.all(np.abs(x - dq) <= step / 2 + 1e-6)


def test_round_ste_gradient():
    g = jax.grad(lambda x: jnp.sum(round_ste(x * 3.0)))(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones(4))


def test_lwc_tightens_range(rng):
    """Negative LWC logits shrink the clipping range -> smaller scale."""
    x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    spec = QuantSpec(n_bits=4, lwc=True)
    p = lwc_init((8, 32), spec)
    s_wide, _ = minmax_scale_zp(x, spec, p["up"], p["low"])
    s_tight, _ = minmax_scale_zp(x, spec, p["up"] - 6.0, p["low"] - 6.0)
    assert np.all(np.asarray(s_tight) < np.asarray(s_wide))


def test_lwc_gradient_flows(rng):
    x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    spec = QuantSpec(n_bits=4, lwc=True)
    p = lwc_init((8, 32), spec)

    def loss(p):
        return jnp.mean((fake_quant_dynamic(x, spec, p["up"], p["low"]) - x) ** 2)

    g = jax.grad(loss)(p)
    assert np.isfinite(np.asarray(g["up"])).all()
    assert np.abs(np.asarray(g["up"])).sum() > 0
