"""Tests for SmoothQuant / AWQ / HQQ / OmniQuant transforms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.models import (
    TINY_LLAMA,
    TINY_OPT,
    forward_logits,
    init_params,
    quantize_model_rtn,
)
from llama3_quantization_tpu.quant import QuantSpec, dequantize, quantize_rtn
from llama3_quantization_tpu.quant.awq import awq_quantize_model, awq_search_alpha
from llama3_quantization_tpu.quant.hqq import hqq_quantize_model, hqq_quantize_weight
from llama3_quantization_tpu.quant.omniquant import OmniConfig, omniquant_model
from llama3_quantization_tpu.quant.quantizer import fake_quant_dynamic
from llama3_quantization_tpu.quant.smoothing import (
    fold_fc_fc,
    fold_norm_linears,
    fold_q_k,
    smoothquant_scale,
)
from llama3_quantization_tpu.quant.smoothquant import smoothquant_model


# ---------------------------------------------------------------------------
# smoothing algebra is fp-neutral
# ---------------------------------------------------------------------------


def _rms(x, w, b=None):
    y = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-5) * w
    return y + b if b is not None else y


def test_fold_norm_linears_fp_neutral(rng):
    d, n = 16, 24
    x = rng.standard_normal((8, d)).astype(np.float32)
    norm = {"w": jnp.asarray(rng.standard_normal(d).astype(np.float32))}
    lin = {"w": jnp.asarray(rng.standard_normal((d, n)).astype(np.float32))}
    scale = jnp.asarray(np.exp(rng.standard_normal(d)).astype(np.float32))
    n2, (l2,) = fold_norm_linears(norm, [lin], scale)
    before = _rms(x, np.asarray(norm["w"])) @ np.asarray(lin["w"])
    # RMSNorm is scale-equivariant only per-call: folding divides the norm
    # weight and multiplies the linear rows, so rms(x)*w/s @ (s*W) == before
    after = _rms(x, np.asarray(n2["w"])) @ np.asarray(l2["w"])
    np.testing.assert_allclose(after, before, rtol=2e-4, atol=2e-5)


def test_fold_fc_fc_fp_neutral(rng):
    k, m, n = 12, 16, 8
    x = rng.standard_normal((5, k)).astype(np.float32)
    fc1 = {"w": jnp.asarray(rng.standard_normal((k, m)).astype(np.float32)),
           "b": jnp.asarray(rng.standard_normal(m).astype(np.float32))}
    fc2 = {"w": jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))}
    scale = jnp.asarray(np.exp(rng.standard_normal(m)).astype(np.float32))
    f1, f2 = fold_fc_fc(fc1, fc2, scale)
    before = (x @ np.asarray(fc1["w"]) + np.asarray(fc1["b"])) @ np.asarray(fc2["w"])
    after = (x @ np.asarray(f1["w"]) + np.asarray(f1["b"])) @ np.asarray(f2["w"])
    np.testing.assert_allclose(after, before, rtol=2e-4, atol=2e-5)


def test_fold_q_k_score_neutral(rng):
    d, n = 12, 8
    x = rng.standard_normal((5, d)).astype(np.float32)
    q = {"w": jnp.asarray(rng.standard_normal((d, n)).astype(np.float32))}
    k = {"w": jnp.asarray(rng.standard_normal((d, n)).astype(np.float32))}
    scale = jnp.asarray(np.exp(rng.standard_normal(n)).astype(np.float32))
    q2, k2 = fold_q_k(q, k, scale)
    before = (x @ np.asarray(q["w"])) @ (x @ np.asarray(k["w"])).T
    after = (x @ np.asarray(q2["w"])) @ (x @ np.asarray(k2["w"])).T
    np.testing.assert_allclose(after, before, rtol=2e-4, atol=2e-4)


def test_smoothing_reduces_act_quant_error(rng):
    """The SmoothQuant effect: with outlier activation channels, migrating
    range into weights shrinks W8A8 matmul error."""
    t, k, n = 64, 32, 16
    x = rng.standard_normal((t, k)).astype(np.float32)
    x[:, :4] *= 50.0  # outlier channels
    w = rng.standard_normal((k, n)).astype(np.float32)
    ref = x @ w
    a8 = QuantSpec(n_bits=8)
    w8 = QuantSpec(n_bits=8)

    def quant_err(xs, ws):
        xq = np.asarray(fake_quant_dynamic(jnp.asarray(xs), a8))
        wq = np.asarray(fake_quant_dynamic(jnp.asarray(ws.T), w8)).T
        return np.mean((xq @ wq - ref) ** 2)

    s = np.asarray(
        smoothquant_scale(
            jnp.asarray(np.abs(x).max(0)), jnp.asarray(np.abs(w).max(1)), 0.5
        )
    )
    err_plain = quant_err(x, w)
    err_smooth = quant_err(x / s, w * s[:, None])
    assert err_smooth < err_plain * 0.5, (err_smooth, err_plain)


# ---------------------------------------------------------------------------
# model-level transforms
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cfg", [TINY_LLAMA, TINY_OPT], ids=["llama", "opt"])
def test_smoothquant_model_fp_neutral(cfg):
    """Folding alone (no quantization) must not change model outputs."""
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 16))
    toks = jnp.asarray(calib[:2])
    sp = smoothquant_model(params, cfg, calib, alpha=0.5)
    out_fp = forward_logits(params, toks, cfg)
    out_sm = forward_logits(sp, toks, cfg)
    np.testing.assert_allclose(
        np.asarray(out_sm), np.asarray(out_fp), rtol=1e-3, atol=1e-4
    )


def test_awq_search_improves_over_identity(rng):
    t, k, n = 128, 32, 16
    x = rng.standard_normal((t, k)).astype(np.float32)
    x[:, :3] *= 30.0
    w = rng.standard_normal((k, n)).astype(np.float32)
    spec = QuantSpec(n_bits=3, group_size=16)
    s = np.asarray(awq_search_alpha(jnp.asarray(x), jnp.asarray(w), spec))
    ref = x @ w

    def err(scale):
        ws = w * scale[:, None]
        wq = np.asarray(fake_quant_dynamic(jnp.asarray(ws.T), spec)).T
        return np.mean(((x / scale[None, :]) @ wq - ref) ** 2)

    assert err(s) <= err(np.ones(k)) * 1.001


def test_awq_model_runs_and_quantizes():
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 16))
    spec = QuantSpec(n_bits=4, group_size=32)
    qp = awq_quantize_model(params, cfg, calib, spec, n_grid=6, sample_tokens=64)
    out = forward_logits(qp, jnp.asarray(calib[:2]), cfg)
    assert bool(jnp.isfinite(out).all())
    from llama3_quantization_tpu.quant import QuantizedTensor

    assert isinstance(qp["layers"]["q"]["w"], QuantizedTensor)


# ---------------------------------------------------------------------------
# HQQ
# ---------------------------------------------------------------------------


def test_hqq_beats_rtn_reconstruction(rng):
    """On heavy-tailed weights HQQ's lp-shrinkage zero-point optimization
    should reduce weighted reconstruction error vs RTN."""
    k, n = 64, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    w *= np.exp(rng.standard_normal((k, n)) * 1.0).astype(np.float32)  # heavy tails
    spec = QuantSpec(n_bits=3, group_size=32)
    qt_h = hqq_quantize_weight(jnp.asarray(w), spec, iters=25)
    qt_r = quantize_rtn(jnp.asarray(w), spec)
    e_h = np.abs(np.asarray(dequantize(qt_h, jnp.float32)) - w)
    e_r = np.abs(np.asarray(dequantize(qt_r, jnp.float32)) - w)
    # lp objective: compare p-norm error
    assert (e_h**0.7).mean() < (e_r**0.7).mean()


def test_hqq_model_runs():
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = hqq_quantize_model(params, cfg, QuantSpec(n_bits=4, group_size=32), iters=10)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    fp = forward_logits(params, toks, cfg)
    out = forward_logits(qp, toks, cfg)
    assert float(jnp.mean(jnp.abs(out - fp))) < 0.1


# ---------------------------------------------------------------------------
# OmniQuant LWC
# ---------------------------------------------------------------------------


def test_omniquant_improves_over_rtn():
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 16))
    toks = jnp.asarray(calib)
    spec = QuantSpec(n_bits=2, group_size=32)
    fp = forward_logits(params, toks, cfg)

    ocfg = OmniConfig(wspec=QuantSpec(n_bits=2, group_size=32, lwc=True), epochs=8, batch_size=4)
    qp_omni = omniquant_model(params, cfg, calib, ocfg)
    qp_rtn = quantize_model_rtn(params, cfg, spec)
    err_omni = float(jnp.mean((forward_logits(qp_omni, toks, cfg) - fp) ** 2))
    err_rtn = float(jnp.mean((forward_logits(qp_rtn, toks, cfg) - fp) ** 2))
    assert err_omni < err_rtn, (err_omni, err_rtn)


def test_omniquant_epochs0_is_rtn():
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 8))
    spec_lwc = QuantSpec(n_bits=4, group_size=32, lwc=True)
    qp = omniquant_model(params, cfg, calib, OmniConfig(wspec=spec_lwc, epochs=0))
    toks = jnp.asarray(calib)
    out = forward_logits(qp, toks, cfg)
    # epochs=0 keeps init logits (sigmoid(4)≈0.982 clipping) — near-RTN
    qp_rtn = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=32))
    out_rtn = forward_logits(qp_rtn, toks, cfg)
    assert float(jnp.mean(jnp.abs(out - out_rtn))) < 0.05


def test_let_fold_fp_neutral():
    """apply_let with arbitrary scales/shifts must preserve the fp forward."""
    from llama3_quantization_tpu.quant.omniquant import apply_let, init_layer_let
    from llama3_quantization_tpu.quant.calibration import _layer_slice
    from llama3_quantization_tpu.models.transformer import decoder_layer, causal_mask, rope_cos_sin

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    p0 = _layer_slice(params["layers"], 0)
    let = init_layer_let(p0, cfg)
    rng_np = np.random.default_rng(0)
    let = {
        k: jnp.asarray(np.exp(rng_np.standard_normal(v.shape) * 0.3).astype(np.float32))
        if "scale" in k
        else jnp.asarray(rng_np.standard_normal(v.shape).astype(np.float32) * 0.1)
        for k, v in let.items()
    }
    folded = apply_let(p0, let, cfg)
    h = jnp.asarray(rng_np.standard_normal((2, 8, cfg.hidden_size)).astype(np.float32))
    positions = jnp.arange(8)[None, :]
    cos_sin = rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, h.dtype)
    mask = causal_mask(8)
    from llama3_quantization_tpu.models.transformer import NO_QUANT

    out_ref = decoder_layer(p0, h, cfg, NO_QUANT, cos_sin, mask)[0]
    out_fold = decoder_layer(folded, h, cfg, NO_QUANT, cos_sin, mask)[0]
    np.testing.assert_allclose(
        np.asarray(out_fold), np.asarray(out_ref), rtol=2e-3, atol=2e-4
    )


def test_omniquant_let_trains():
    """Joint LET+LWC at W3A8 should improve over plain LWC at the same cfg
    (or at minimum stay finite and close)."""
    from llama3_quantization_tpu.models.transformer import RuntimeQuantConfig

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 16))
    toks = jnp.asarray(calib)
    fp = forward_logits(params, toks, cfg)
    rq = RuntimeQuantConfig(act=QuantSpec(n_bits=8))
    wspec = QuantSpec(n_bits=3, group_size=32, lwc=True)
    qp_let = omniquant_model(
        params, cfg, calib,
        OmniConfig(wspec=wspec, epochs=6, batch_size=4, let=True), rq=rq,
    )
    err_let = float(jnp.mean((forward_logits(qp_let, toks, cfg, rq) - fp) ** 2))
    qp_lwc = omniquant_model(
        params, cfg, calib, OmniConfig(wspec=wspec, epochs=6, batch_size=4), rq=rq,
    )
    err_lwc = float(jnp.mean((forward_logits(qp_lwc, toks, cfg, rq) - fp) ** 2))
    assert np.isfinite(err_let)
    assert err_let < err_lwc * 1.5, (err_let, err_lwc)


def test_omniquant_resume(tmp_path):
    """Second run with resume_dir must reuse saved aux params (identical
    output) without retraining."""
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 8))
    wspec = QuantSpec(n_bits=3, group_size=32, lwc=True)
    ocfg = OmniConfig(wspec=wspec, epochs=2, batch_size=2, resume_dir=str(tmp_path))
    qp1 = omniquant_model(params, cfg, calib, ocfg)
    qp2 = omniquant_model(params, cfg, calib, ocfg)  # resumes
    toks = jnp.asarray(calib)
    np.testing.assert_allclose(
        np.asarray(forward_logits(qp1, toks, cfg)),
        np.asarray(forward_logits(qp2, toks, cfg)),
        rtol=1e-5, atol=1e-6,
    )
    import os
    assert os.path.exists(tmp_path / "omni_layer_0.npz")


def test_act_stats_save_load(tmp_path):
    from llama3_quantization_tpu.quant.smoothquant import (
        collect_act_stats, load_act_stats, save_act_stats, smoothquant_model,
    )

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 8))
    stats = collect_act_stats(params, cfg, calib)
    path = str(tmp_path / "act_stats.npz")
    save_act_stats(stats, path)
    loaded = load_act_stats(path)
    assert len(loaded) == cfg.num_layers
    np.testing.assert_allclose(
        np.asarray(stats[0]["q"]["absmax"]), np.asarray(loaded[0]["q"]["absmax"]), rtol=1e-6
    )
    # smoothquant_model accepts precomputed stats
    sp = smoothquant_model(params, cfg, calib, act_stats=loaded)
    toks = jnp.asarray(calib)
    np.testing.assert_allclose(
        np.asarray(forward_logits(sp, toks, cfg)),
        np.asarray(forward_logits(params, toks, cfg)),
        rtol=1e-3, atol=1e-4,
    )


def test_fold_q_k_gqa_reduce_respects_head_layout(rng):
    """GQA fold: k scales = mean over the q heads sharing each kv head,
    in head-major layout; q·kᵀ approximately preserved for mildly varying
    scales and exactly for head-shared ones."""
    import jax.numpy as jnp

    hd, h, hkv = 8, 4, 2
    nq, nk = h * hd, hkv * hd
    q = {"w": jnp.asarray(rng.standard_normal((16, nq)).astype(np.float32))}
    k = {"w": jnp.asarray(rng.standard_normal((16, nk)).astype(np.float32))}
    # head-shared scale: exactly invariant per (q-head, kv-head) pair mean
    s_head = jnp.asarray(rng.uniform(0.5, 2.0, hd).astype(np.float32))
    scale = jnp.tile(s_head, h)
    q2, k2 = fold_q_k(q, k, scale, head_dim=hd)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    qh = (x @ q["w"]).reshape(4, h, hd)
    kh = (x @ k["w"]).reshape(4, hkv, hd)
    qh2 = (x @ q2["w"]).reshape(4, h, hd)
    kh2 = (x @ k2["w"]).reshape(4, hkv, hd)
    rep = h // hkv
    for g in range(hkv):
        for r in range(rep):
            a = jnp.einsum("bd,cd->bc", qh[:, g * rep + r], kh[:, g])
            b = jnp.einsum("bd,cd->bc", qh2[:, g * rep + r], kh2[:, g])
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


def test_omniquant_act_stats_and_aug_loss():
    """LET initializes from collected activation stats (not ones), and
    aug_loss trains without error; llama omits shift params."""
    import jax
    import jax.numpy as jnp

    from llama3_quantization_tpu.models import TINY_LLAMA, forward_logits, init_params
    from llama3_quantization_tpu.quant.omniquant import (
        OmniConfig,
        init_layer_let,
        omniquant_model,
    )
    from llama3_quantization_tpu.quant.calibration import _layer_slice
    from llama3_quantization_tpu.quant.smoothquant import collect_act_stats
    from llama3_quantization_tpu.quant.quantizer import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16))
    stats = collect_act_stats(params, cfg, calib, batch_size=2)
    p0 = _layer_slice(params["layers"], 0)
    let = init_layer_let(p0, cfg, stats[0])
    assert float(jnp.std(let["qkv_scale"])) > 0  # seeded, not ones
    assert "qkv_shift" not in let  # llama: no trained shifts

    fp = forward_logits(params, calib[:1], cfg)
    qp = omniquant_model(
        params, cfg, calib,
        OmniConfig(wspec=QuantSpec(n_bits=8, group_size=32, lwc=True),
                   epochs=1, let=True, aug_loss=True, batch_size=2),
    )
    out = forward_logits(qp, calib[:1], cfg)
    err = float(jnp.mean(jnp.abs(out - fp))) / (float(jnp.mean(jnp.abs(fp))) + 1e-9)
    assert err < 0.1, err
