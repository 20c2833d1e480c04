"""NF4 codebook + IR-QLoRA ICQ tests."""

import numpy as np
import jax
import jax.numpy as jnp

from llama3_quantization_tpu.quant.irqlora import (
    ICQWeight,
    _block_entropy,
    ice_lora_apply,
    icq_dequantize,
    icq_search,
)
from llama3_quantization_tpu.quant.nf4 import (
    DYNAMIC_FP8_MAP,
    NF4_CODE,
    nf4_codes,
    nf4_dequantize,
    nf4_quantize,
    quantize_to_codebook,
)


def test_nf4_code_is_sorted_sym():
    code = np.asarray(NF4_CODE)
    assert code[0] == -1 and code[-1] == 1 and code[7] == 0
    assert np.all(np.diff(code) > 0)


def test_codebook_roundtrip_exact():
    """Codebook values themselves must quantize to themselves."""
    idx = quantize_to_codebook(NF4_CODE, NF4_CODE)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(16))


def test_nf4_quantize_error_bounded(rng):
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.1
    t = nf4_quantize(jnp.asarray(w), double_quant=False)
    back = np.asarray(nf4_dequantize(t))
    assert back.shape == w.shape
    # error bounded by half the largest codebook gap times blockwise absmax
    blocks = w.reshape(-1, 64)
    absmax = np.abs(blocks).max(1, keepdims=True)
    gap = np.diff(np.asarray(NF4_CODE)).max() / 2
    assert np.all(np.abs(back.reshape(-1, 64) - blocks) <= absmax * gap + 1e-6)


def test_nf4_double_quant_close_to_single(rng):
    w = rng.standard_normal((256, 64)).astype(np.float32)
    t1 = nf4_quantize(jnp.asarray(w), double_quant=False)
    t2 = nf4_quantize(jnp.asarray(w), double_quant=True)
    d1 = np.asarray(nf4_dequantize(t1))
    d2 = np.asarray(nf4_dequantize(t2))
    # double-quantized absmax adds small extra error only
    e1 = np.abs(d1 - w).mean()
    e2 = np.abs(d2 - w).mean()
    assert e2 < e1 * 1.2


def test_icq_improves_entropy(rng):
    # biased weights: ICQ's tau shift should increase code entropy vs tau=0
    w = (rng.standard_normal((4 * 256 * 64,)) * 0.2 + 0.3).astype(np.float32)
    wj = jnp.asarray(w)
    q = icq_search(wj, tau_n=10)
    ent_icq = float(_block_entropy(q.codes).mean())
    from llama3_quantization_tpu.quant.irqlora import _nf4_block_quant

    codes0, _ = _nf4_block_quant(wj.reshape(-1, 64))
    ent0 = float(_block_entropy(codes0).mean())
    assert ent_icq >= ent0 - 1e-6


def test_icq_reconstruction_reasonable(rng):
    w = rng.standard_normal((256 * 64 * 2,)).astype(np.float32)
    q = icq_search(jnp.asarray(w), tau_n=5)
    back = np.asarray(icq_dequantize(q)).reshape(-1)
    corr = np.corrcoef(back, w)[0, 1]
    assert corr > 0.98


def test_ice_lora_apply_shapes(rng):
    k, n, r = 64, 256, 8  # numel must be a multiple of 256*64 (ICQ block2)
    w = rng.standard_normal((k, n)).astype(np.float32)
    q = icq_search(jnp.asarray(w.reshape(-1)), tau_n=3)
    q = ICQWeight(q.codes, q.absmax, q.tau_codes, q.tau_absmax, (k, n))
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    la = jnp.asarray(rng.standard_normal((k, r)).astype(np.float32) * 0.01)
    lb = jnp.zeros((r, n), jnp.float32)
    out = ice_lora_apply(x, q, la, lb, jnp.float32(0.0), jnp.float32(0.0))
    assert out.shape == (4, n)
    # zero LoRA + zero scales == pure base path
    base = np.asarray(x) @ np.asarray(icq_dequantize(q))
    np.testing.assert_allclose(np.asarray(out), base, rtol=1e-4, atol=1e-5)


def test_irqlora_model_transform():
    import dataclasses
    from llama3_quantization_tpu.models import forward_logits, init_params
    from llama3_quantization_tpu.models.configs import TINY_LLAMA
    from llama3_quantization_tpu.quant.irqlora import irqlora_quantize_model

    # hidden=64: q/k/v/gate shapes 64x? -> numel multiples of 16384 needed;
    # scale the tiny config up just enough
    cfg = dataclasses.replace(TINY_LLAMA, hidden_size=128, intermediate_size=256,
                              num_heads=4, num_kv_heads=2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = irqlora_quantize_model(params, cfg, tau_n=3)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    fp = forward_logits(params, toks, cfg)
    out = forward_logits(qp, toks, cfg)
    err = float(jnp.mean(jnp.abs(out - fp)))
    assert 0 < err < 1.0  # quantized but sane


def test_dynamic_map_unsigned():
    """signed=False must produce a magnitude-only 256-entry map, and the
    overflow guard must reject maps larger than the code space."""
    import pytest

    from llama3_quantization_tpu.quant.nf4 import make_dynamic_map

    signed = np.asarray(make_dynamic_map(signed=True))
    unsigned = np.asarray(make_dynamic_map(signed=False))
    assert len(signed) == 256 and len(unsigned) == 256
    assert unsigned.min() >= 0.0
    assert (unsigned > 0).sum() > (signed > 0).sum()
    assert unsigned.max() == 1.0
    with pytest.raises(ValueError, match="dynamic map"):
        make_dynamic_map(signed=False, max_exponent_bits=8)  # 257 > 2^8


def test_api_dispatch_irqlora_and_mixed():
    import jax
    import jax.numpy as jnp

    from llama3_quantization_tpu.api import quantize
    from llama3_quantization_tpu.models import TINY_LLAMA, forward_logits, init_params
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16))
    qp = quantize(params, cfg, method="irqlora", tau_n=2)
    assert bool(jnp.isfinite(forward_logits(qp, jnp.asarray(toks), cfg)).all())
    mp = quantize(
        params, cfg, method="mixed", spec=QuantSpec(n_bits=2, group_size=32),
        calib_tokens=toks, pack=False, topk=2, blocksize=32,
    )
    assert bool(jnp.isfinite(forward_logits(mp, jnp.asarray(toks), cfg)).all())


def test_nf4_odd_shapes_roundtrip():
    """Shapes bnb handles must not crash: numel not a multiple of the block
    size, and >256 absmax blocks not a multiple of 256."""
    import jax
    import jax.numpy as jnp

    from llama3_quantization_tpu.quant.nf4 import nf4_dequantize, nf4_quantize

    for shape in [(7, 13), (64, 320), (300, 70)]:
        w = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        t = nf4_quantize(w, double_quant=True)
        out = nf4_dequantize(t)
        assert out.shape == shape
        rel = float(jnp.linalg.norm(out - w) / jnp.linalg.norm(w))
        assert rel < 0.12, (shape, rel)


def test_hqq_irqlora_cover_moe_experts():
    import jax
    import jax.numpy as jnp

    from llama3_quantization_tpu.models import forward_logits, init_params
    from llama3_quantization_tpu.models.configs import TINY_MIXTRAL
    from llama3_quantization_tpu.quant import QuantSpec, QuantizedTensor
    from llama3_quantization_tpu.quant.hqq import hqq_quantize_model
    from llama3_quantization_tpu.quant.irqlora import irqlora_quantize_model

    cfg = TINY_MIXTRAL
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    fp = forward_logits(params, toks, cfg)

    hq = hqq_quantize_model(params, cfg, QuantSpec(n_bits=8, group_size=32), iters=5)
    assert isinstance(hq["layers"]["experts"]["gate"]["w"], QuantizedTensor)
    out = forward_logits(hq, toks, cfg)
    assert float(jnp.mean(jnp.abs(out - fp))) / (float(jnp.mean(jnp.abs(fp))) + 1e-9) < 0.1

    # tiny experts need a small double-quant block to be blockable
    ir = irqlora_quantize_model(params, cfg, tau_n=4, blocksize2=16)
    egate = ir["layers"]["experts"]["gate"]["w"]
    # ICQ dequantizes in place: experts stay arrays but are changed
    assert not isinstance(egate, QuantizedTensor)
    assert float(jnp.max(jnp.abs(egate - params["layers"]["experts"]["gate"]["w"]))) > 0
    out2 = forward_logits(ir, toks, cfg)
    assert bool(jnp.isfinite(out2).all())
