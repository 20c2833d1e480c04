"""Exactness tests for the s4 (native-int4) W4·A8 backend.

The s4 path must produce EXACTLY the same values as computing
`quantize_activations_s8(x)` followed by an exact-arithmetic matmul against
`dequantize(qt)` — the weight math is integer plus one f32 scale per group,
so the only tolerance needed is f32 accumulation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama3_quantization_tpu.ops import matmul as mm
from llama3_quantization_tpu.ops.a8_matmul import quantize_activations_s8
from llama3_quantization_tpu.ops.s4_matmul import s4_matmul
from llama3_quantization_tpu.quant import QuantSpec
from llama3_quantization_tpu.quant.qtensor import dequantize, quantize_rtn


def _oracle(x, qt):
    """Exact f64 reference of the s4 path's math (s8 activations, exact
    grouped weight dequant)."""
    x2d = np.asarray(x, np.float32).reshape(-1, qt.k)
    xq, s_x = quantize_activations_s8(jnp.asarray(x2d))
    xq = np.asarray(xq, np.float64)
    s_x = np.asarray(s_x, np.float64)
    w = np.asarray(dequantize(qt, jnp.float32), np.float64)
    return (xq @ w) * s_x


def _mk(k, n, bits, gs, pack, sym=False, no_zp=False, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.array(rng.normal(size=(k, n)).astype(np.float32) * 0.05)
    spec = QuantSpec(n_bits=bits, group_size=gs, symmetric=sym, disable_zero_point=no_zp)
    return quantize_rtn(w, spec, pack=pack)


@pytest.mark.parametrize(
    "bits,gs,pack,b",
    [
        (4, 32, True, 1),     # decode BD path, packed storage
        (4, 32, False, 1),    # decode BD path, int8-container storage
        (4, 32, True, 4),     # small batch BD
        (4, 32, True, 64),    # prefill regime (batched group dots)
        (4, None, True, 1),   # per-column groups (g == 1 fast path)
        (3, 32, True, 1),     # 3-bit codes in the int4 container
        (2, 32, True, 2),     # 2-bit codes
    ],
)
def test_s4_matches_oracle(bits, gs, pack, b):
    k, n = 128, 96
    qt = _mk(k, n, bits, gs, pack)
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(b, k)).astype(np.float32))
    got = np.asarray(s4_matmul(x, qt, out_dtype=jnp.float32), np.float64)
    exp = _oracle(x, qt)
    scale = np.abs(exp).max() + 1e-9
    assert np.abs(got - exp).max() / scale < 5e-6


@pytest.mark.parametrize("sym,no_zp", [(True, False), (False, True)])
def test_s4_symmetric(sym, no_zp):
    qt = _mk(128, 64, 4, 32, pack=False, sym=sym, no_zp=no_zp)
    if no_zp:
        assert qt.zero is None  # exercises the zero-free branch
    x = jnp.array(np.random.default_rng(2).normal(size=(1, 128)).astype(np.float32))
    got = np.asarray(s4_matmul(x, qt, out_dtype=jnp.float32), np.float64)
    exp = _oracle(x, qt)
    assert np.abs(got - exp).max() / (np.abs(exp).max() + 1e-9) < 5e-6


def test_s4_leading_shape():
    qt = _mk(64, 48, 4, 32, pack=True)
    x = jnp.array(np.random.default_rng(3).normal(size=(2, 3, 64)).astype(np.float32))
    y = s4_matmul(x, qt)
    assert y.shape == (2, 3, 48)


def test_backend_dispatch():
    """qmatmul with backend='s4' routes 4-bit tensors to the s4 path and
    8-bit per-column tensors (the s8 head recode) to the a8 dot."""
    from llama3_quantization_tpu.quant.serving import recode_head_s8

    qt4 = _mk(64, 48, 4, 32, pack=True)
    w_head = jnp.array(np.random.default_rng(4).normal(size=(64, 32)).astype(np.float32))
    qt8 = recode_head_s8(w_head)
    x = jnp.array(np.random.default_rng(5).normal(size=(1, 64)).astype(np.float32))
    with mm.backend("s4"):
        y4 = mm.qmatmul(x, qt4, out_dtype=jnp.float32)
        y8 = mm.qmatmul(x, qt8, out_dtype=jnp.float32)
    exp4 = _oracle(x, qt4)
    assert np.abs(np.asarray(y4, np.float64) - exp4).max() / (np.abs(exp4).max() + 1e-9) < 5e-6
    exp8 = _oracle(x, qt8)
    assert np.abs(np.asarray(y8, np.float64) - exp8).max() / (np.abs(exp8).max() + 1e-9) < 5e-6


def test_s4_rejects_wide_codes():
    qt8 = _mk(64, 32, 8, 32, pack=False)
    x = jnp.ones((1, 64), jnp.float32)
    with pytest.raises(ValueError):
        s4_matmul(x, qt8)


def test_s4_generate_end_to_end():
    """Tiny-model greedy decode under backend='s4' (exercises the
    prepare_decode_params hoist + S4Weight scan slicing) stays close to the
    bf16 dequant forward."""
    from llama3_quantization_tpu.models import TINY_LLAMA
    from llama3_quantization_tpu.models.synthetic import init_quantized_params
    from llama3_quantization_tpu.models.transformer import (
        greedy_generate,
        init_kv_cache,
    )

    cfg = TINY_LLAMA
    spec = QuantSpec(n_bits=4, group_size=32)
    params = init_quantized_params(cfg, spec, pack=True, dtype=jnp.float32)
    tok = jnp.zeros((1, 1), jnp.int32)

    def run(backend):
        cache = init_kv_cache(cfg, 1, 32)
        with mm.backend(backend):
            toks, _ = jax.jit(
                lambda p, c, t: greedy_generate(p, c, t, jnp.int32(0), 8, cfg)
            )(params, cache, tok)
        return np.asarray(toks)

    t_s4 = run("s4")
    t_xla = run("xla")
    # s8 activation quantization may flip near-tie argmaxes on random tiny
    # weights; require the large majority of steps to agree
    assert (t_s4 == t_xla).mean() >= 0.75


# ---------------------------------------------------------------------------
# s4 under the mesh (tensor parallel)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh():
    from llama3_quantization_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh"
    return make_mesh(dp=2, tp=4)


def test_s4_sharded_forward_matches_single_device(mesh):
    """Megatron-sharded packed weights under backend='s4': the in-jit
    prepare_s4 (container -> int4) runs on the tp shards and the sharded
    forward reproduces the single-device s4 result."""
    from llama3_quantization_tpu.models import TINY_LLAMA, init_params, quantize_model_rtn
    from llama3_quantization_tpu.models.transformer import forward_logits
    from llama3_quantization_tpu.parallel import make_sharded_forward, shard_params

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=16), pack=True)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    with mm.backend("s4"):
        ref = forward_logits(qp, toks, cfg)
        sharded = shard_params(qp, mesh, cfg)
        out = make_sharded_forward(cfg, mesh)(sharded, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_s4_sharded_generate_matches_single_device(mesh):
    """Sharded greedy decode under backend='s4' (prepare_decode_params
    builds S4Weight leaves inside the sharded jit) emits the same tokens
    as the single-device s4 decode."""
    from llama3_quantization_tpu.models import TINY_LLAMA
    from llama3_quantization_tpu.models.synthetic import init_quantized_params
    from llama3_quantization_tpu.models.transformer import greedy_generate, init_kv_cache
    from llama3_quantization_tpu.parallel import shard_params

    cfg = TINY_LLAMA
    spec = QuantSpec(n_bits=4, group_size=16)
    params = init_quantized_params(cfg, spec, pack=True, dtype=jnp.float32)
    tok = jnp.zeros((2, 1), jnp.int32)

    def run(p):
        cache = init_kv_cache(cfg, 2, 32)
        with mm.backend("s4"):
            toks, _ = jax.jit(
                lambda p, c, t: greedy_generate(p, c, t, jnp.int32(0), 8, cfg)
            )(p, cache, tok)
        return np.asarray(toks)

    ref = run(params)
    sharded = shard_params(params, mesh, cfg)
    out = run(sharded)
    np.testing.assert_array_equal(ref, out)


def test_ksplit_matvec_exact(monkeypatch):
    """Wide-N decode matvec (the lm_head path): K-split block-diagonal
    partial sums must be bit-exact vs the full-K dot for both the s8 and
    s4 containers (thresholds patched down so CPU-sized shapes route
    through it)."""
    from llama3_quantization_tpu.ops import a8_matmul as a8m
    from llama3_quantization_tpu.ops.a8_matmul import a8_matmul
    from llama3_quantization_tpu.quant.serving import recode_head_s4, recode_head_s8

    rng = np.random.default_rng(7)
    w = jnp.array(rng.normal(size=(128, 256)).astype(np.float32) * 0.05)
    x = jnp.array(rng.normal(size=(2, 128)).astype(np.float32))

    for recode, fn in ((recode_head_s8, a8_matmul), (recode_head_s4, s4_matmul)):
        qt = recode(w)
        base = np.asarray(fn(x, qt, out_dtype=jnp.float32), np.float64)
        monkeypatch.setattr(a8m, "KSPLIT_MIN_N", 256)
        monkeypatch.setattr(a8m, "KSPLIT_G", 8)
        got = np.asarray(fn(x, qt, out_dtype=jnp.float32), np.float64)
        monkeypatch.setattr(a8m, "KSPLIT_MIN_N", 65536)
        monkeypatch.setattr(a8m, "KSPLIT_G", 16)
        scale = np.abs(base).max() + 1e-9
        assert np.abs(got - base).max() / scale < 5e-6, fn.__name__


def test_bd_kchunk_exact(monkeypatch):
    """K-chunked block-diagonal decode dots (separate per-chunk arrays —
    S4_CHUNK_MAXG policy) must match the unchunked form exactly (each
    scale group lives in exactly one chunk), in both the decode (b small)
    and prefill (b > BD_MAX_B) regimes."""
    from llama3_quantization_tpu.ops import s4_matmul as s4m
    from llama3_quantization_tpu.ops.s4_matmul import prepare_s4

    qt = _mk(256, 96, 4, 32, pack=True, seed=11)  # G = 8 groups
    for b in (2, s4m.BD_MAX_B + 1):
        x = jnp.array(
            np.random.default_rng(12).normal(size=(b, 256)).astype(np.float32)
        )
        monkeypatch.setattr(s4m, "S4_CHUNK_MAXG", 0)
        assert prepare_s4(qt).chunks == 1
        base = np.asarray(s4_matmul(x, qt, out_dtype=jnp.float32), np.float64)
        monkeypatch.setattr(s4m, "S4_CHUNK_MAXG", 2)
        assert prepare_s4(qt).chunks == 4
        got = np.asarray(s4_matmul(x, qt, out_dtype=jnp.float32), np.float64)
        assert np.array_equal(got, base)
        exp = _oracle(x, qt)
        assert np.abs(got - exp).max() / (np.abs(exp).max() + 1e-9) < 5e-6
