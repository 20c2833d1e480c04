"""Mixtral MoE tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.models import forward_logits, init_params, quantize_model_rtn
from llama3_quantization_tpu.models.configs import TINY_MIXTRAL
from llama3_quantization_tpu.quant import QuantSpec, QuantizedTensor


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_MIXTRAL
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    return cfg, params, toks


def test_moe_forward(setup):
    cfg, params, toks = setup
    out = forward_logits(params, toks, cfg)
    assert out.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.isfinite(out).all())


def test_moe_causality(setup):
    cfg, params, toks = setup
    a = forward_logits(params, toks, cfg)
    toks2 = toks.at[:, -1].set((toks[:, -1] + 1) % cfg.vocab_size)
    b = forward_logits(params, toks2, cfg)
    np.testing.assert_allclose(np.asarray(a[:, :-1]), np.asarray(b[:, :-1]), atol=1e-5)


def test_moe_routing_actually_sparse(setup):
    """Zeroing a never-selected expert must not change outputs; zeroing a
    selected one must."""
    cfg, params, toks = setup
    from llama3_quantization_tpu.models.transformer import NO_QUANT, _moe_block
    from llama3_quantization_tpu.quant.calibration import _layer_slice

    p0 = _layer_slice(params["layers"], 0)
    h = jax.random.normal(jax.random.PRNGKey(3), (1, 8, cfg.hidden_size), jnp.float32)
    base = _moe_block(p0, h, cfg, NO_QUANT)
    # which experts get weight?
    logits = h @ p0["router"]["w"]
    probs = jax.nn.softmax(logits, axis=-1)
    topi = np.asarray(jax.lax.top_k(probs, cfg.num_experts_per_tok)[1]).ravel()
    used = set(topi.tolist())
    unused = [e for e in range(cfg.num_experts) if e not in used]
    if unused:
        e = unused[0]
        p_mod = jax.tree_util.tree_map(lambda x: x, p0)
        p_mod["experts"] = jax.tree_util.tree_map(
            lambda x: x.at[e].set(0.0), p0["experts"]
        )
        out2 = _moe_block(p_mod, h, cfg, NO_QUANT)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(base), atol=1e-6)
    e_used = topi[0]
    p_mod2 = jax.tree_util.tree_map(lambda x: x, p0)
    p_mod2["experts"] = jax.tree_util.tree_map(
        lambda x: x.at[e_used].set(0.0), p0["experts"]
    )
    out3 = _moe_block(p_mod2, h, cfg, NO_QUANT)
    assert np.abs(np.asarray(out3) - np.asarray(base)).max() > 1e-6


def test_moe_quantization(setup):
    cfg, params, toks = setup
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=32), pack=True)
    assert isinstance(qp["layers"]["experts"]["gate"]["w"], QuantizedTensor)
    assert not isinstance(qp["layers"]["router"]["w"], QuantizedTensor)  # router fp
    fp = forward_logits(params, toks, cfg)
    q = forward_logits(qp, toks, cfg)
    err = float(jnp.mean(jnp.abs(q - fp)))
    assert 0 < err < 1.0


def test_moe_sharded(setup):
    from llama3_quantization_tpu.parallel import make_mesh, make_sharded_forward, shard_params

    cfg, params, toks = setup
    mesh = make_mesh(dp=2, tp=4)
    ref = forward_logits(params, toks, cfg)
    sharded = shard_params(params, mesh, cfg)
    out = make_sharded_forward(cfg, mesh)(sharded, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_moe_expert_parallel_sharding(setup):
    """EP: experts sharded on the tp axis reproduce single-device outputs."""
    from llama3_quantization_tpu.parallel import make_mesh, make_sharded_forward, shard_params

    cfg, params, toks = setup
    mesh = make_mesh(dp=2, tp=4)
    ref = forward_logits(params, toks, cfg)
    sharded = shard_params(params, mesh, cfg, expert_parallel=True)
    # expert axis actually distributed
    w = sharded["layers"]["experts"]["gate"]["w"]
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert all(sh[1] == cfg.num_experts // 4 for sh in shard_shapes), shard_shapes
    out = make_sharded_forward(cfg, mesh)(sharded, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_moe_gptq(setup):
    from llama3_quantization_tpu.quant.calibration import gptq_quantize_model

    cfg, params, toks = setup
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 8))
    qp = gptq_quantize_model(params, cfg, calib, QuantSpec(n_bits=4, group_size=32),
                             blocksize=32)
    assert isinstance(qp["layers"]["experts"]["down"]["w"], QuantizedTensor)
    assert isinstance(qp["layers"]["q"]["w"], QuantizedTensor)
    fp = forward_logits(params, toks, cfg)
    out = forward_logits(qp, toks, cfg)
    err = float(jnp.mean(jnp.abs(out - fp)))
    assert 0 < err < 1.0


def test_moe_capacity_matches_dense_when_roomy(setup):
    """With capacity >= every expert's true load, dispatch must reproduce
    the dense exact-routing output."""
    from llama3_quantization_tpu.models import set_moe_capacity

    cfg, params, toks = setup
    ref = forward_logits(params, toks, cfg)
    set_moe_capacity(float(cfg.num_experts))  # C >= T: nothing can drop
    try:
        out = forward_logits(params, toks, cfg)
    finally:
        set_moe_capacity(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_moe_capacity_drops_tokens_when_tight(setup):
    """A tiny capacity factor must still produce finite outputs while
    differing from dense (overflow contributions dropped)."""
    from llama3_quantization_tpu.models import set_moe_capacity

    cfg, params, toks = setup
    ref = forward_logits(params, toks, cfg)
    set_moe_capacity(0.25)
    try:
        out = forward_logits(params, toks, cfg)
    finally:
        set_moe_capacity(None)
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.max(jnp.abs(out - ref))) > 0.0


def test_moe_capacity_expert_parallel(setup):
    """Capacity dispatch under EP sharding matches its own single-device
    output (collectives ride the dispatch einsums)."""
    from llama3_quantization_tpu.models import set_moe_capacity
    from llama3_quantization_tpu.parallel import make_mesh, make_sharded_forward, shard_params

    cfg, params, toks = setup
    set_moe_capacity(float(cfg.num_experts))
    try:
        ref = forward_logits(params, toks, cfg)
        mesh = make_mesh(dp=2, tp=4)
        sharded = shard_params(params, mesh, cfg, expert_parallel=True)
        out = make_sharded_forward(cfg, mesh)(sharded, toks)
    finally:
        set_moe_capacity(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_moe_capacity_validation():
    from llama3_quantization_tpu.models import set_moe_capacity

    with pytest.raises(ValueError):
        set_moe_capacity(0.0)


def test_moe_awq(setup):
    """AWQ on Mixtral: ln2 scales fold into router+experts, expert weights
    come back quantized, and W8 output error stays small."""
    from llama3_quantization_tpu.quant.awq import awq_quantize_model

    cfg, params, toks = setup
    fp = forward_logits(params, toks, cfg)
    qp = awq_quantize_model(
        params, cfg, np.asarray(toks), QuantSpec(n_bits=8, group_size=32), n_grid=5
    )
    assert isinstance(qp["layers"]["experts"]["gate"]["w"], QuantizedTensor)
    assert isinstance(qp["layers"]["q"]["w"], QuantizedTensor)
    out = forward_logits(qp, toks, cfg)
    err = float(jnp.mean(jnp.abs(out - fp)))
    scale = float(jnp.mean(jnp.abs(fp))) + 1e-9
    assert err / scale < 0.2


def test_moe_omniquant_lwc_let(setup):
    """OmniQuant LWC(+LET) trains per-expert clipping and bakes quantized
    experts; scale-only LET fold keeps the fp forward exact."""
    from llama3_quantization_tpu.quant.calibration import _layer_slice
    from llama3_quantization_tpu.quant.omniquant import (
        OmniConfig,
        apply_let,
        init_layer_let,
        omniquant_model,
    )
    from llama3_quantization_tpu.models.transformer import (
        NO_QUANT,
        causal_mask,
        decoder_layer,
        rope_cos_sin,
    )

    cfg, params, toks = setup
    # fp-neutrality of the MoE LET fold with arbitrary scales
    p0 = _layer_slice(params["layers"], 0)
    let = init_layer_let(p0, cfg)
    assert "fc1_shift" not in let  # scale-only for MoE
    key = jax.random.PRNGKey(7)
    let["fc1_scale"] = jnp.exp(0.3 * jax.random.normal(key, let["fc1_scale"].shape))
    h = jax.random.normal(jax.random.PRNGKey(8), (1, 8, cfg.hidden_size), jnp.float32)
    folded = apply_let(p0, let, cfg)
    cos_sin = rope_cos_sin(jnp.arange(8)[None, :], cfg.head_dim_, cfg.rope_theta, h.dtype)
    mask = causal_mask(8)
    base = decoder_layer(p0, h, cfg, NO_QUANT, cos_sin, mask)[0]
    out = decoder_layer(folded, h, cfg, NO_QUANT, cos_sin, mask)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-4)

    fp = forward_logits(params, toks, cfg)
    qp = omniquant_model(
        params,
        cfg,
        np.asarray(toks),
        OmniConfig(
            wspec=QuantSpec(n_bits=8, group_size=32, lwc=True),
            epochs=1,
            let=True,
            batch_size=2,
        ),
    )
    assert isinstance(qp["layers"]["experts"]["up"]["w"], QuantizedTensor)
    out = forward_logits(qp, toks, cfg)
    err = float(jnp.mean(jnp.abs(out - fp)))
    scale = float(jnp.mean(jnp.abs(fp))) + 1e-9
    assert err / scale < 0.2
