"""Model forward/decode tests on tiny configs (real code paths, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.models import (
    TINY_LLAMA,
    TINY_OPT,
    RuntimeQuantConfig,
    decode_step,
    forward_logits,
    init_kv_cache,
    init_params,
    quantize_model_rtn,
)
from llama3_quantization_tpu.models.configs import TINY_FALCON
from llama3_quantization_tpu.quant import QuantSpec

CFGS = [TINY_LLAMA, TINY_OPT, TINY_FALCON]
ARCHS = ["llama", "opt", "falcon"]


@pytest.fixture(scope="module")
def setups():
    out = {}
    for cfg in CFGS:
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, cfg.vocab_size)
        out[cfg.arch] = (cfg, params, toks)
    return out


@pytest.mark.parametrize("arch", ARCHS)
def test_forward_shapes_finite(setups, arch):
    cfg, params, toks = setups[arch]
    logits = forward_logits(params, toks, cfg)
    assert logits.shape == (2, 24, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.parametrize("arch", ARCHS)
def test_causality(setups, arch):
    """Changing a future token must not change past logits."""
    cfg, params, toks = setups[arch]
    logits = forward_logits(params, toks, cfg)
    toks2 = toks.at[:, -1].set((toks[:, -1] + 1) % cfg.vocab_size)
    logits2 = forward_logits(params, toks2, cfg)
    np.testing.assert_allclose(
        np.asarray(logits[:, :-1]), np.asarray(logits2[:, :-1]), atol=1e-5
    )
    assert np.abs(np.asarray(logits[:, -1]) - np.asarray(logits2[:, -1])).max() > 1e-3


@pytest.mark.parametrize("arch", ARCHS)
def test_decode_matches_full_forward(setups, arch):
    cfg, params, toks = setups[arch]
    full = forward_logits(params, toks, cfg)
    cache = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    # prefill 16, then decode 8 one at a time
    logits, cache = decode_step(params, cache, toks[:, :16], jnp.int32(0), cfg)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, :16]), rtol=2e-4, atol=2e-4
    )
    for i in range(16, 24):
        logits, cache = decode_step(params, cache, toks[:, i : i + 1], jnp.int32(i), cfg)
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full[:, i]), rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("arch", ARCHS)
def test_quantization_monotone_degradation(setups, arch):
    cfg, params, toks = setups[arch]
    fp = forward_logits(params, toks, cfg)
    errs = []
    for bits in (8, 4, 2):
        qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=bits, group_size=32), pack=True)
        q = forward_logits(qp, toks, cfg)
        errs.append(float(jnp.mean(jnp.abs(q - fp))))
    assert errs[0] < errs[1] < errs[2]
    assert errs[0] < 0.05


def test_act_quant_runs(setups):
    cfg, params, toks = setups["llama"]
    rq = RuntimeQuantConfig(
        act=QuantSpec(n_bits=8),
        q=QuantSpec(n_bits=8),
        k=QuantSpec(n_bits=8),
        v=QuantSpec(n_bits=8),
        p=QuantSpec(n_bits=8, metric="fix0to1"),
    )
    out = forward_logits(params, toks, cfg, rq)
    fp = forward_logits(params, toks, cfg)
    err = float(jnp.mean(jnp.abs(out - fp)))
    assert 0 < err < 1.0


def test_jit_forward(setups):
    cfg, params, toks = setups["llama"]
    from functools import partial

    f = jax.jit(partial(forward_logits, cfg=cfg))
    np.testing.assert_allclose(
        np.asarray(f(params, toks)), np.asarray(forward_logits(params, toks, cfg)),
        rtol=1e-4, atol=1e-4,
    )
