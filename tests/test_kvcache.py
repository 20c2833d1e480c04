"""Quantized KV cache tests."""

import numpy as np
import jax
import jax.numpy as jnp

from llama3_quantization_tpu.models import (
    TINY_LLAMA,
    decode_step,
    forward_logits,
    init_kv_cache,
    init_params,
)
from llama3_quantization_tpu.ops.kvcache import kv_dequantize, kv_quantize


def test_kv_quant_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 4, 16)).astype(np.float32))
    codes, scale = kv_quantize(x)
    back = np.asarray(kv_dequantize(codes, scale, jnp.float32))
    # symmetric int8: rel error bounded by 1/254 of per-vector absmax
    absmax = np.abs(np.asarray(x)).max(-1, keepdims=True)
    assert np.all(np.abs(back - np.asarray(x)) <= absmax / 127 + 1e-6)


def test_quantized_cache_decode_close_to_fp():
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    full = forward_logits(params, toks, cfg)

    qcache = init_kv_cache(cfg, 2, 32, quantized=True)
    logits, qcache = decode_step(params, qcache, toks[:, :8], jnp.int32(0), cfg)
    for i in range(8, 16):
        logits, qcache = decode_step(params, qcache, toks[:, i : i + 1], jnp.int32(i), cfg)
    # int8 KV adds bounded noise; last-token logits stay close
    err = float(jnp.max(jnp.abs(logits[:, 0] - full[:, -1])))
    fp_cache = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    logits_fp, fp_cache = decode_step(params, fp_cache, toks[:, :8], jnp.int32(0), cfg)
    for i in range(8, 16):
        logits_fp, fp_cache = decode_step(params, fp_cache, toks[:, i : i + 1], jnp.int32(i), cfg)
    err_fp = float(jnp.max(jnp.abs(logits_fp[:, 0] - full[:, -1])))
    assert err_fp < 1e-3  # fp cache is exact
    assert err < 0.1  # int8 cache close
    assert err > err_fp  # but not exact


def test_quantized_cache_memory_halved():
    cfg = TINY_LLAMA
    qc = init_kv_cache(cfg, 1, 64, quantized=True)
    fc = init_kv_cache(cfg, 1, 64, dtype=jnp.bfloat16)
    q_bytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize for v in qc.values())
    f_bytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize for v in fc.values())
    # int8 codes + f32 scales (1/16 of D=16 head dim overhead -> 1.25x int8)
    assert q_bytes < f_bytes * 0.7


def test_ring_cache_sliding_window():
    """Decode past the buffer length wraps to sliding-window attention and
    keeps producing sane logits (the pre-ring code silently clobbered the
    last slot)."""
    from llama3_quantization_tpu.models.transformer import greedy_generate

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    max_len = 16
    cache = init_kv_cache(cfg, 1, max_len, dtype=jnp.float32)
    tok = jnp.zeros((1, 1), jnp.int32)
    # generate 3x the cache length
    toks, cache = greedy_generate(params, cache, tok, jnp.int32(0), max_len * 3, cfg)
    assert toks.shape == (1, max_len * 3)
    assert bool((toks >= 0).all()) and bool((toks < cfg.vocab_size).all())


def test_ring_cache_within_window_matches_full():
    """While pos < max_len the ring semantics must equal plain causal."""
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    full = forward_logits(params, toks, cfg)
    cache = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = decode_step(params, cache, toks[:, :8], jnp.int32(0), cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :8]), rtol=2e-4, atol=2e-4)
    for i in range(8, 12):
        logits, cache = decode_step(params, cache, toks[:, i:i+1], jnp.int32(i), cfg)
        np.testing.assert_allclose(np.asarray(logits[:, 0]), np.asarray(full[:, i]), rtol=2e-4, atol=2e-4)


def test_attention_sink_pins_prefix():
    """With sink_tokens, the first positions stay attendable far past the
    window; without, they are forgotten (mask check via decode parity)."""
    from functools import partial
    from llama3_quantization_tpu.models.transformer import decode_step

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    max_len, sink = 16, 4
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)

    def run(sink_tokens, n_steps=40):
        cache = init_kv_cache(cfg, 1, max_len, dtype=jnp.float32)
        logits, cache = decode_step(params, cache, prompt, jnp.int32(0), cfg,
                                    sink_tokens=sink_tokens)
        tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        step = jax.jit(partial(decode_step, cfg=cfg, sink_tokens=sink_tokens))
        outs = []
        pos = 8
        for _ in range(n_steps):
            logits, cache = step(params, cache, tok, jnp.int32(pos))
            tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
            outs.append(int(tok[0, 0]))
            pos += 1
        return outs

    with_sink = run(sink)
    without = run(0)
    # both stay sane; far beyond the window they generally diverge because
    # the sink keeps early context alive
    assert all(0 <= t < cfg.vocab_size for t in with_sink + without)
    assert with_sink != without


def test_sink_zero_matches_plain_ring():
    """sink_tokens=0 must be numerically identical to the plain ring."""
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    full = forward_logits(params, toks, cfg)
    cache = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = decode_step(params, cache, toks, jnp.int32(0), cfg, sink_tokens=0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full), rtol=2e-4, atol=2e-4)


def test_ring_mask_oracle():
    """_ring_write_and_mask vs a direct simulation of slot contents."""
    from llama3_quantization_tpu.models.transformer import _ring_write_and_mask

    max_len = 12
    for sink in (0, 3):
        w = max_len - sink
        # simulate slot -> absolute position after writing tokens 0..P
        for P in (0, 5, 11, 12, 17, 40):
            slot_abs = [-1] * max_len
            for p in range(P + 1):
                s = p if p < max_len else sink + (p - sink) % w
                slot_abs[s] = p
            ws, mask = _ring_write_and_mask(jnp.int32(P), 1, max_len, sink)
            expect_ws = P if P < max_len else sink + (P - sink) % w
            assert int(ws) == expect_ws, (sink, P)
            m = np.asarray(mask)[0]
            for s in range(max_len):
                valid = m[s] == 0.0
                # slot must be valid iff it holds a real position <= P that
                # is either in the sink or within the ring window
                p = slot_abs[s]
                expect = p >= 0 and (p < sink or p > P - w or P < max_len)
                # pre-wrap: everything written is within window trivially
                if p >= 0 and P >= max_len and sink <= p <= P - w:
                    expect = False
                assert valid == expect, (sink, P, s, p, valid, expect)


def test_int4_kv_cache_decode():
    from llama3_quantization_tpu.ops.kvcache import kv4_dequantize, kv4_quantize

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4, 16)).astype(np.float32))
    packed, scale = kv4_quantize(x)
    # T-pair pack: two T-adjacent tokens share a byte row (kv4_pack)
    assert packed.shape == (2, 3, 2, 16) and packed.dtype == jnp.uint8
    back = np.asarray(kv4_dequantize(packed, scale, jnp.float32))
    absmax = np.abs(np.asarray(x)).max(-1, keepdims=True)
    assert np.all(np.abs(back - np.asarray(x)) <= absmax / 7 + 1e-6)

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    full = forward_logits(params, toks, cfg)
    cache = init_kv_cache(cfg, 1, 16, quantized=4)
    logits, cache = decode_step(params, cache, toks[:, :8], jnp.int32(0), cfg)
    for i in range(8, 12):
        logits, cache = decode_step(params, cache, toks[:, i:i+1], jnp.int32(i), cfg)
    err = float(jnp.max(jnp.abs(logits[:, 0] - full[:, -1])))
    assert err < 0.5  # int4 KV noise, bounded
    # memory: int4 cache is ~0.4x the int8 cache bytes (codes halve)
    c8 = init_kv_cache(cfg, 1, 16, quantized=True)
    b4 = sum(v.size * v.dtype.itemsize for v in cache.values())
    b8 = sum(v.size * v.dtype.itemsize for v in c8.values())
    assert b4 < b8


def test_flash_decode_kernel_matches_xla_path():
    """The Pallas s8 flash-decode kernel (interpret mode on CPU) matches the
    XLA dequant path over a full greedy decode on the int8 cache, for both
    the scalar-pos and the multi-slot (per-row pos) masks."""
    from llama3_quantization_tpu.models import set_decode_kernel
    from llama3_quantization_tpu.models.transformer import decode_step_multi

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)

    outs = {}
    for mode in (False, "interpret"):
        set_decode_kernel(mode)
        try:
            cache = init_kv_cache(cfg, 2, 16, quantized=True)
            lg, cache = decode_step(params, cache, toks[:, :4], jnp.int32(0), cfg)
            seq = [lg[:, -1]]
            for i in range(4, 12):
                lg, cache = decode_step(params, cache, toks[:, i:i+1], jnp.int32(i), cfg)
                seq.append(lg[:, 0])
            # multi-slot step at staggered positions
            mcache = init_kv_cache(cfg, 2, 16, quantized=True)
            _, mcache = decode_step(params, mcache, toks[:, :4], jnp.int32(0), cfg)
            mlg, _ = decode_step_multi(
                params, mcache, toks[:, 4:5], jnp.array([4, 2]), cfg
            )
            outs[mode] = (jnp.stack(seq), mlg)
        finally:
            set_decode_kernel("auto")
    np.testing.assert_allclose(
        np.asarray(outs["interpret"][0]), np.asarray(outs[False][0]),
        rtol=0.05, atol=0.05,  # kernel re-quantizes q and probs to s8
    )
    np.testing.assert_allclose(
        np.asarray(outs["interpret"][1]), np.asarray(outs[False][1]),
        rtol=0.05, atol=0.05,
    )
    # and both track the fp forward loosely (sanity: same model)
    full = forward_logits(params, toks, cfg)
    d = float(jnp.max(jnp.abs(outs["interpret"][0][-1] - full[:, -1])))
    assert d < 0.2, d


def test_flash_decode_kernel_fp_cache_matches_eager():
    """The fp-cache flash-decode kernel (interpret mode) matches the eager
    XLA decode path essentially exactly (same fp32 math, online softmax)."""
    from llama3_quantization_tpu.models import set_decode_kernel

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    outs = {}
    for mode in (False, "interpret"):
        set_decode_kernel(mode)
        try:
            cache = init_kv_cache(cfg, 2, 16, dtype=jnp.float32)
            lg, cache = decode_step(params, cache, toks[:, :4], jnp.int32(0), cfg)
            seq = [lg[:, -1]]
            for i in range(4, 12):
                lg, cache = decode_step(params, cache, toks[:, i:i+1], jnp.int32(i), cfg)
                seq.append(lg[:, 0])
            outs[mode] = jnp.stack(seq)
        finally:
            set_decode_kernel("auto")
    np.testing.assert_allclose(
        np.asarray(outs["interpret"]), np.asarray(outs[False]), rtol=1e-4, atol=1e-4
    )


def test_flash_decode_kernel_int4_matches_xla_path():
    """int4-packed cache through the kernel (in-kernel split-halves nibble
    unpack) matches the XLA dequant path."""
    from llama3_quantization_tpu.models import set_decode_kernel

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    outs = {}
    for mode in (False, "interpret"):
        set_decode_kernel(mode)
        try:
            cache = init_kv_cache(cfg, 2, 16, quantized=4)
            lg, cache = decode_step(params, cache, toks[:, :4], jnp.int32(0), cfg)
            seq = [lg[:, -1]]
            for i in range(4, 12):
                lg, cache = decode_step(params, cache, toks[:, i:i+1], jnp.int32(i), cfg)
                seq.append(lg[:, 0])
            outs[mode] = jnp.stack(seq)
        finally:
            set_decode_kernel("auto")
    np.testing.assert_allclose(
        np.asarray(outs["interpret"]), np.asarray(outs[False]),
        rtol=0.08, atol=0.08,  # int4 noise + kernel's q/probs s8 rounding
    )


def test_xla_codes_attn_matches_kernel():
    """The XLA codes-direct int8 decode attention (round 4 — the Pallas
    DMA cap made it the TPU default) matches the interpret-mode kernel
    near-exactly: identical quantization of q and probs, same online math
    (the non-stacked variants measured bit-identical on device)."""
    from llama3_quantization_tpu.models import set_decode_kernel
    from llama3_quantization_tpu.models.transformer import (
        decode_step_multi,
        set_decode_attn,
    )

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)

    outs = {}
    for attn in ("kernel", "xla"):
        set_decode_kernel("interpret")
        set_decode_attn(attn)
        try:
            cache = init_kv_cache(cfg, 2, 16, quantized=True)
            lg, cache = decode_step(params, cache, toks[:, :4], jnp.int32(0), cfg)
            seq = [lg[:, -1]]
            for i in range(4, 12):
                lg, cache = decode_step(params, cache, toks[:, i:i+1], jnp.int32(i), cfg)
                seq.append(lg[:, 0])
            mcache = init_kv_cache(cfg, 2, 16, quantized=True)
            _, mcache = decode_step(params, mcache, toks[:, :4], jnp.int32(0), cfg)
            mlg, _ = decode_step_multi(
                params, mcache, toks[:, 4:5], jnp.array([4, 2]), cfg
            )
            outs[attn] = (jnp.stack(seq), mlg)
        finally:
            set_decode_kernel("auto")
            set_decode_attn("auto")
    np.testing.assert_allclose(
        np.asarray(outs["xla"][0]), np.asarray(outs["kernel"][0]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outs["xla"][1]), np.asarray(outs["kernel"][1]),
        rtol=1e-4, atol=1e-4,
    )
