"""Layer-stacked decode-cache path (models/transformer._decode_layer_scan).

The stacked form carries the full [L, B, H, T, *] cache buffers through the
decode layer scan and updates only the token slot in place — eliminating
the per-step whole-cache slice/re-stack copies of the xs/ys form (round-1
b8 trace: two ~0.41 ms/step copies). These tests pin:

- bit-identical results vs the per-layer kernel path (same kernel body,
  interpret mode) for int8, int4-packed and fp caches;
- identical results for multi-slot decode (vector positions);
- the routing predicate `_stacked_decode_ok` (kernel-off/CPU -> False);
- greedy_generate equivalence across the two forms.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from llama3_quantization_tpu.models import TINY_LLAMA, init_params
from llama3_quantization_tpu.models import transformer as T


@pytest.fixture
def params():
    return init_params(TINY_LLAMA, jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.fixture(autouse=True)
def _restore_globals():
    yield
    T.set_decode_kernel("auto")
    T.set_stacked_decode("auto")


def _run_steps(params, cache, tok, n=4, multi=False, pos0=0):
    cfg = TINY_LLAMA
    if multi:
        step = jax.jit(partial(T.decode_step_multi, cfg=cfg))
        pos = jnp.asarray(pos0, jnp.int32)
        for _ in range(n):
            lg, cache = step(params, cache, tok, pos)
            pos = pos + 1
    else:
        step = jax.jit(partial(T.decode_step, cfg=cfg))
        for i in range(n):
            lg, cache = step(params, cache, tok, jnp.int32(pos0 + i))
    return lg, cache


@pytest.mark.parametrize("kv_bits", [8, 4])
def test_stacked_matches_per_layer_kernel(params, kv_bits):
    cfg = TINY_LLAMA
    tok = jnp.array([[3], [5]], jnp.int32)
    cache0 = T.init_kv_cache(cfg, 2, 64, quantized=kv_bits)
    T.set_decode_kernel("interpret")
    T.set_stacked_decode(False)
    lg_a, c_a = _run_steps(params, dict(cache0), tok)
    T.set_stacked_decode("auto")
    lg_b, c_b = _run_steps(params, dict(cache0), tok)
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))
    for k in c_a:
        np.testing.assert_array_equal(np.asarray(c_a[k]), np.asarray(c_b[k]))


def test_stacked_fp_cache_matches_per_layer(params):
    cfg = TINY_LLAMA
    tok = jnp.array([[3], [5]], jnp.int32)
    cache0 = T.init_kv_cache(cfg, 2, 64, dtype=jnp.float32)
    T.set_decode_kernel("interpret")
    T.set_stacked_decode(False)
    lg_a, c_a = _run_steps(params, dict(cache0), tok)
    T.set_stacked_decode("auto")
    assert T._stacked_decode_ok(T.NO_QUANT, cache0, 1)
    lg_b, c_b = _run_steps(params, dict(cache0), tok)
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))
    for k in c_a:
        np.testing.assert_array_equal(np.asarray(c_a[k]), np.asarray(c_b[k]))


def test_stacked_multi_slot_matches(params):
    """Vector-pos (multi-slot) stacked decode is explicit opt-in
    (`set_stacked_decode(True)`) — the scatter-into-carry write measured
    2.8x slower on v5e, so "auto" keeps the per-layer form there — but
    when forced it must still be bit-exact."""
    cfg = TINY_LLAMA
    tok = jnp.array([[3], [5]], jnp.int32)
    cache0 = T.init_kv_cache(cfg, 2, 64, quantized=8)
    pos = jnp.array([5, 9], jnp.int32)
    T.set_decode_kernel("interpret")
    T.set_stacked_decode(False)
    lg_a, c_a = jax.jit(partial(T.decode_step_multi, cfg=cfg))(params, dict(cache0), tok, pos)
    T.set_stacked_decode(True)
    lg_b, c_b = jax.jit(partial(T.decode_step_multi, cfg=cfg))(params, dict(cache0), tok, pos)
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))
    for k in c_a:
        np.testing.assert_array_equal(np.asarray(c_a[k]), np.asarray(c_b[k]))


def test_predicate_routing(params):
    cfg = TINY_LLAMA
    cache_q = T.init_kv_cache(cfg, 2, 64, quantized=8)
    cache_fp = T.init_kv_cache(cfg, 2, 64, dtype=jnp.float32)
    # kernel disabled -> never stacked
    T.set_decode_kernel(False)
    assert not T._stacked_decode_ok(T.NO_QUANT, cache_q, 1)
    # CPU + auto -> kernel unavailable -> not stacked
    T.set_decode_kernel("auto")
    if jax.default_backend() != "tpu":
        assert not T._stacked_decode_ok(T.NO_QUANT, cache_q, 1)
    # prefill (s > 1) is never stacked
    T.set_decode_kernel("interpret")
    assert not T._stacked_decode_ok(T.NO_QUANT, cache_q, 2)
    # stacked explicitly off
    T.set_stacked_decode(False)
    assert not T._stacked_decode_ok(T.NO_QUANT, cache_q, 1)
    T.set_stacked_decode("auto")
    # runtime attention hooks (rq.k) bar the kernel -> not stacked
    from llama3_quantization_tpu.quant import QuantSpec

    rq = T.RuntimeQuantConfig(k=QuantSpec(n_bits=8))
    assert not T._stacked_decode_ok(rq, cache_fp, 1)


def test_greedy_generate_stacked_matches(params):
    """The on-device generate loop produces the same tokens through the
    stacked and per-layer cache forms."""
    cfg = TINY_LLAMA
    tok0 = jnp.array([[7]], jnp.int32)
    cache0 = T.init_kv_cache(cfg, 1, 64, quantized=8)
    T.set_decode_kernel("interpret")
    outs = {}
    for stacked in (False, "auto"):
        T.set_stacked_decode(stacked)
        gen = jax.jit(partial(T.greedy_generate, cfg=cfg, n_steps=6))
        toks, _ = gen(params, dict(cache0), tok0, jnp.int32(0))
        outs[stacked] = np.asarray(toks)
    np.testing.assert_array_equal(outs[False], outs["auto"])
