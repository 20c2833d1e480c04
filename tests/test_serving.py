"""Continuous-batching engine tests: parity with single-sequence decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.models import TINY_LLAMA, init_kv_cache, init_params
from llama3_quantization_tpu.models.transformer import greedy_generate
from llama3_quantization_tpu.serving import ServingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def _single_greedy(params, cfg, prompt, n):
    cache = init_kv_cache(cfg, 1, 64, dtype=jnp.float32)
    from llama3_quantization_tpu.models.transformer import decode_step

    toks = jnp.asarray(np.asarray(prompt, np.int32)[None, :])
    logits, cache = decode_step(params, cache, toks, jnp.int32(0), cfg)
    first = int(np.asarray(jnp.argmax(logits[0, -1])))
    gen, _ = greedy_generate(
        params, cache, jnp.asarray([[first]], jnp.int32), jnp.int32(len(prompt)), n - 1, cfg
    )
    return [first] + np.asarray(gen)[0].tolist()


def test_engine_matches_single_sequence(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=4, max_len=64)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 5, 5, 5, 5]]
    N = 6
    rids = [eng.add_request(p, max_new_tokens=N) for p in prompts]
    eng.run()
    for rid, p in zip(rids, prompts):
        got = eng.result(rid)
        want = _single_greedy(params, cfg, p, N)
        assert got == want, (got, want)


def test_engine_continuous_join(setup):
    """A request added mid-flight decodes correctly alongside others."""
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=4, max_len=64)
    r1 = eng.add_request([1, 2, 3], max_new_tokens=8)
    for _ in range(3):
        eng.step()
    r2 = eng.add_request([4, 4, 4, 4], max_new_tokens=5)
    eng.run()
    want1 = _single_greedy(params, cfg, [1, 2, 3], 8)
    want2 = _single_greedy(params, cfg, [4, 4, 4, 4], 5)
    assert eng.result(r1) == want1
    assert eng.result(r2) == want2


def test_engine_slot_reuse(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=2, max_len=64)
    a = eng.add_request([1, 2], max_new_tokens=3)
    b = eng.add_request([3, 4], max_new_tokens=3)
    eng.run()
    assert len(eng.free) == 2
    c = eng.add_request([7, 8, 9], max_new_tokens=4)
    eng.run()
    want = _single_greedy(params, cfg, [7, 8, 9], 4)
    assert eng.result(c) == want


def test_engine_eos_stops(setup):
    cfg, params = setup
    # discover the first generated token, then use it as "eos"
    probe = ServingEngine(params, cfg, max_slots=1, max_len=64)
    r = probe.add_request([1, 2, 3], max_new_tokens=4)
    probe.run()
    first = probe.result(r)[0]

    eng = ServingEngine(params, cfg, max_slots=1, max_len=64)
    r2 = eng.add_request([1, 2, 3], max_new_tokens=50, eos_id=first)
    eng.run()
    assert eng.result(r2) == [first]
    assert len(eng.free) == 1


def test_engine_no_free_slots(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=1, max_len=64)
    eng.add_request([1], max_new_tokens=10)
    with pytest.raises(RuntimeError):
        eng.add_request([2], max_new_tokens=10)


def test_recode_head_s8():
    """Head recode keeps logits close to the fp head and rides qlinear."""
    import dataclasses as dc

    from llama3_quantization_tpu.models import TINY_LLAMA, forward_logits, init_params
    from llama3_quantization_tpu.models.configs import ModelConfig
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.qtensor import QuantizedTensor
    from llama3_quantization_tpu.quant.serving import recode_model_s8
    from llama3_quantization_tpu.models.params import quantize_model_rtn

    cfg = dc.replace(TINY_LLAMA, tie_word_embeddings=False)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=8, group_size=None))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    base = forward_logits(recode_model_s8(qp, cfg), toks, cfg)
    rp = recode_model_s8(qp, cfg, include_head=True)
    assert isinstance(rp["lm_head"], QuantizedTensor) and rp["lm_head"].zero is None
    out = forward_logits(rp, toks, cfg)
    err = float(jnp.max(jnp.abs(out - base)))
    scale = float(jnp.max(jnp.abs(base)))
    assert err < 0.02 * max(scale, 1.0), (err, scale)
    # argmax mostly preserved (random tiny-model logits are near-tied, so
    # exact greedy equality is not a meaningful bar)
    agree = float(jnp.mean(jnp.argmax(out, -1) == jnp.argmax(base, -1)))
    assert agree >= 0.75, agree


def test_add_requests_batched_matches_sequential(setup):
    """Batch admission (one prefill per bucket) generates exactly what
    per-request admission does — including mixed bucket sizes and a
    non-power-of-2 joiner count."""
    cfg, params = setup
    prompts = [[3, 5, 7], [2, 4, 6, 8, 1], list(range(1, 20)), [9, 9]]

    eng_a = ServingEngine(params, cfg, max_slots=4, max_len=64)
    rids_a = [eng_a.add_request(p, max_new_tokens=6) for p in prompts]
    eng_a.run()
    out_a = [eng_a.result(r) for r in rids_a]

    eng_b = ServingEngine(params, cfg, max_slots=4, max_len=64)
    rids_b = eng_b.add_requests([(p, 6, None) for p in prompts])
    eng_b.run()
    out_b = [eng_b.result(r) for r in rids_b]
    assert out_a == out_b


def test_add_requests_overflow_raises(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=2, max_len=64)
    with pytest.raises(RuntimeError):
        eng.add_requests([([1], 2, None)] * 3)


def test_recode_head_s4():
    """The int4 per-column head recode (the s4 backend's head format):
    dequant error bounded by half an int4 step per column, and the s4
    matmul path reproduces the dequant matmul."""
    from llama3_quantization_tpu.ops.matmul import backend, qmatmul
    from llama3_quantization_tpu.quant.qtensor import dequantize
    from llama3_quantization_tpu.quant.serving import recode_head_s4

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 512), jnp.float32) * 0.02
    qt = recode_head_s4(w)
    assert qt.bits == 4 and qt.zero is None and qt.group_size is None
    wq = np.asarray(dequantize(qt, jnp.float32))
    step = np.asarray(qt.scale)[0]
    assert np.all(np.abs(wq - np.asarray(w)) <= step / 2 + 1e-6)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64), jnp.float32)
    ref = np.asarray(x) @ wq
    for be in ("xla", "s4"):
        with backend(be):
            out = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32))
        # the s4 path additionally quantizes activations to s8 per token
        np.testing.assert_allclose(out, ref, rtol=0.02, atol=0.02)


def test_recode_head_shards():
    """TP sharding must handle a QuantizedTensor lm_head (review finding:
    spec/param leaf mismatch crashed tree_unflatten)."""
    import dataclasses as dc

    from llama3_quantization_tpu.models import TINY_LLAMA, forward_logits, init_params
    from llama3_quantization_tpu.models.params import quantize_model_rtn
    from llama3_quantization_tpu.parallel import make_mesh, make_sharded_forward, shard_params
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.serving import recode_model_s8

    cfg = dc.replace(TINY_LLAMA, tie_word_embeddings=False)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=8, group_size=None))
    rp = recode_model_s8(qp, cfg, include_head=True)
    ref = forward_logits(rp, jnp.zeros((1, 8), jnp.int32), cfg)
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(rp, mesh, cfg)
    out = make_sharded_forward(cfg, mesh)(sharded, jnp.zeros((1, 8), jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_engine_sampling():
    """temperature>0 engine decodes reproducibly per seed and differs
    across seeds; default stays greedy."""
    from llama3_quantization_tpu.models import TINY_LLAMA, init_params
    from llama3_quantization_tpu.serving.engine import ServingEngine

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = list(range(1, 9))

    def run(seed, temperature):
        eng = ServingEngine(params, cfg, max_slots=2, max_len=64,
                            temperature=temperature, seed=seed)
        rid = eng.add_request(prompt, max_new_tokens=10)
        while not eng.requests[rid].done and len(eng.requests[rid].generated) < 10:
            eng.step()
        return eng.requests[rid].generated

    greedy1, greedy2 = run(0, 0.0), run(5, 0.0)
    assert greedy1 == greedy2  # seed irrelevant when greedy
    s1, s2, s3 = run(1, 1.5), run(1, 1.5), run(2, 1.5)
    assert s1 == s2
    assert s1 != s3 or s1 != greedy1


def test_engine_rejects_oversized_prompt(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=2, max_len=32)
    with pytest.raises(ValueError):
        eng.add_request(list(range(40)))


def test_engine_bucketed_prefill_matches_exact(setup):
    """Bucket-padded prefill yields the same generations as single-sequence
    greedy for prompts of several odd lengths (crossing bucket boundaries),
    and finished requests are evicted on result()."""
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=4, max_len=64)
    rng = np.random.default_rng(0)
    prompts = [list(map(int, rng.integers(1, cfg.vocab_size, n))) for n in (3, 7, 17, 19)]
    rids = [eng.add_request(p, max_new_tokens=8) for p in prompts]
    eng.run()
    for p, rid in zip(prompts, rids):
        got = eng.result(rid)
        want = _single_greedy(params, cfg, p, 8)
        assert got == want, (len(p), got, want)
        assert rid not in eng.requests  # evicted after read


def test_moe_serving_recode(setup):
    """recode_model_s8 covers MoE expert stacks; a8 forward stays close to
    the pre-recode quantized forward."""
    import dataclasses

    from llama3_quantization_tpu.models import forward_logits, quantize_model_rtn
    from llama3_quantization_tpu.models.configs import TINY_MIXTRAL
    from llama3_quantization_tpu.ops import matmul as mm
    from llama3_quantization_tpu.quant import QuantSpec, QuantizedTensor
    from llama3_quantization_tpu.quant.serving import recode_model_s8

    cfg = dataclasses.replace(TINY_MIXTRAL, num_layers=2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=8, group_size=32))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    ref = forward_logits(qp, toks, cfg)
    rec = recode_model_s8(qp, cfg)
    egate = rec["layers"]["experts"]["gate"]["w"]
    assert isinstance(egate, QuantizedTensor)
    assert egate.group_size is None and egate.sym  # per-column s8 container
    mm.set_backend("a8")
    try:
        out = forward_logits(rec, toks, cfg)
    finally:
        mm.set_backend("xla")
    err = float(jnp.mean(jnp.abs(out - ref)))
    scale = float(jnp.mean(jnp.abs(ref))) + 1e-9
    assert err / scale < 0.05, err / scale


def test_engine_with_tp_sharded_params(setup):
    """The engine works unchanged over tensor-sharded weights (GSPMD
    inserts the collectives into its jitted decode step)."""
    from llama3_quantization_tpu.parallel import make_mesh, shard_params

    cfg, params = setup
    ref_eng = ServingEngine(params, cfg, max_slots=2, max_len=64)
    r = ref_eng.add_request([1, 2, 3, 4], max_new_tokens=6)
    ref_eng.run()
    want = ref_eng.result(r)

    mesh = make_mesh(tp=8)
    sharded = shard_params(params, cfg=cfg, mesh=mesh)
    eng = ServingEngine(sharded, cfg, max_slots=2, max_len=64)
    r2 = eng.add_request([1, 2, 3, 4], max_new_tokens=6)
    eng.run()
    assert eng.result(r2) == want


def test_fuse_for_decode_matches_unfused():
    """QKV/gate-up horizontal fusion is numerically exact vs separate dots
    (per-column scales concatenate), on both the xla and a8 backends, for
    the full forward and the greedy decode loop."""
    import dataclasses as dc

    from llama3_quantization_tpu.models import forward_logits
    from llama3_quantization_tpu.models.params import quantize_model_rtn
    from llama3_quantization_tpu.ops.matmul import backend
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.qtensor import QuantizedTensor
    from llama3_quantization_tpu.quant.serving import fuse_for_decode, recode_model_s8

    cfg = dc.replace(TINY_LLAMA, tie_word_embeddings=False)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=32))
    rp = recode_model_s8(qp, cfg, include_head=True)
    fp = fuse_for_decode(rp, cfg)
    assert "qkv" in fp["layers"] and "q" not in fp["layers"]
    assert "gateup" in fp["layers"] and "gate" not in fp["layers"]
    qkv = fp["layers"]["qkv"]["w"]
    assert isinstance(qkv, QuantizedTensor)
    hd = cfg.head_dim_
    assert qkv.n == (cfg.num_heads + 2 * cfg.num_kv_heads) * hd

    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    for be in ("xla", "a8"):
        with backend(be):
            ref = forward_logits(rp, toks, cfg)
            out = forward_logits(fp, toks, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    with backend("a8"):
        tok0 = toks[:1, :1]
        cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        ref_toks, _ = greedy_generate(rp, cache, tok0, jnp.int32(0), 8, cfg)
        cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        fused_toks, _ = greedy_generate(fp, cache, tok0, jnp.int32(0), 8, cfg)
    np.testing.assert_array_equal(np.asarray(ref_toks), np.asarray(fused_toks))


def test_fuse_for_decode_fp_weights():
    """Fusion also applies to plain fp params (decode without quantization)."""
    from llama3_quantization_tpu.models import forward_logits
    from llama3_quantization_tpu.quant.serving import fuse_for_decode

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    fp = fuse_for_decode(params, cfg)
    assert "qkv" in fp["layers"]
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    ref = forward_logits(params, toks, cfg)
    out = forward_logits(fp, toks, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fuse_for_decode_grouped_matches():
    """Grouped containers (the s4 backend's storage) fuse exactly: [G, N]
    scales/zeros and (packed) data concat along N. Exercised packed and
    unpacked, on the xla and s4 backends, forward and greedy decode."""
    import dataclasses as dc

    from llama3_quantization_tpu.models import forward_logits
    from llama3_quantization_tpu.models.params import quantize_model_rtn
    from llama3_quantization_tpu.ops.matmul import backend
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.qtensor import QuantizedTensor
    from llama3_quantization_tpu.quant.serving import fuse_for_decode

    cfg = dc.replace(TINY_LLAMA, tie_word_embeddings=False)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    for pack in (False, True):
        qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=32), pack=pack)
        fp = fuse_for_decode(qp, cfg)
        assert "qkv" in fp["layers"] and "q" not in fp["layers"]
        qkv = fp["layers"]["qkv"]["w"]
        assert isinstance(qkv, QuantizedTensor) and qkv.packed == pack
        for be in ("xla", "s4"):
            with backend(be):
                ref = forward_logits(qp, toks, cfg)
                out = forward_logits(fp, toks, cfg)
            np.testing.assert_allclose(
                np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5
            )
        with backend("s4"):
            tok0 = toks[:1, :1]
            cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
            ref_toks, _ = greedy_generate(qp, cache, tok0, jnp.int32(0), 8, cfg)
            cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
            fused_toks, _ = greedy_generate(fp, cache, tok0, jnp.int32(0), 8, cfg)
        np.testing.assert_array_equal(np.asarray(ref_toks), np.asarray(fused_toks))


def test_fuse_for_decode_skips_g_idx():
    """Act-order (g_idx) tensors are left unfused rather than broken."""
    import dataclasses as dc

    from llama3_quantization_tpu.models.params import quantize_model_rtn
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.serving import fuse_for_decode

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=32))
    layers = dict(qp["layers"])
    for name in ("q", "k", "v"):
        w = layers[name]["w"]
        layers[name] = {"w": dc.replace(w, g_idx=jnp.zeros((w.data.shape[0], w.k), jnp.int32))}
    qp = dict(qp, layers=layers)
    fp = fuse_for_decode(qp, cfg)
    assert "qkv" not in fp["layers"] and "q" in fp["layers"]


def test_engine_fuse_matches(setup):
    """ServingEngine(fuse=True) produces identical generations."""
    cfg, params = setup
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    outs = []
    for fuse in (False, True):
        eng = ServingEngine(params, cfg, max_slots=2, max_len=64, fuse=fuse)
        rids = [eng.add_request(p, max_new_tokens=6) for p in prompts]
        eng.run()
        outs.append([eng.result(r) for r in rids])
    assert outs[0] == outs[1]


def test_engine_quantized_cache_modes(setup):
    """Engine slot pool / splice plumbing works with the 4-array quantized
    caches (int8 and int4-packed): generations are deterministic and match
    a manual decode loop over the same quantized cache."""
    from llama3_quantization_tpu.models.transformer import decode_step

    cfg, params = setup
    prompt = [1, 2, 3, 4]
    for bits in (True, 4):
        eng = ServingEngine(params, cfg, max_slots=2, max_len=32,
                            quantized_cache=bits)
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run()
        got = eng.result(rid)
        assert len(got) == 5

        # manual loop: prefill + greedy over the same quantized cache
        cache = init_kv_cache(cfg, 1, 32, quantized=bits)
        toks = jnp.asarray([prompt], jnp.int32)
        lg, cache = decode_step(params, cache, toks, jnp.int32(0), cfg)
        cur = int(jnp.argmax(lg[:, -1], axis=-1)[0])
        want = [cur]
        pos = len(prompt)
        for _ in range(4):
            lg, cache = decode_step(
                params, cache, jnp.asarray([[cur]], jnp.int32), jnp.int32(pos), cfg
            )
            cur = int(jnp.argmax(lg[:, -1], axis=-1)[0])
            want.append(cur)
            pos += 1
        assert got == want, (bits, got, want)


def test_engine_tp_sharded_uses_flash_kernel(setup):
    """Sharded serving keeps the Pallas flash-decode path: with a decode
    mesh set, the engine's jitted multi-slot decode shard_maps the kernel
    over tp'd KV head groups and reproduces the single-replica kernel run
    token-for-token."""
    from llama3_quantization_tpu.models import set_decode_kernel, set_decode_mesh
    from llama3_quantization_tpu.parallel import make_mesh, shard_params

    cfg, params = setup
    set_decode_kernel("interpret")
    try:
        ref_eng = ServingEngine(
            params, cfg, max_slots=2, max_len=64, quantized_cache=True
        )
        r = ref_eng.add_request([1, 2, 3, 4], max_new_tokens=6)
        ref_eng.run()
        want = ref_eng.result(r)

        mesh = make_mesh(tp=2, devices=jax.devices()[:2])
        set_decode_mesh(mesh)
        sharded = shard_params(params, cfg=cfg, mesh=mesh)
        eng = ServingEngine(
            sharded, cfg, max_slots=2, max_len=64, quantized_cache=True
        )
        r2 = eng.add_request([1, 2, 3, 4], max_new_tokens=6)
        eng.run()
        assert eng.result(r2) == want
    finally:
        set_decode_kernel("auto")
        set_decode_mesh(None)


def test_step_n_matches_single_steps(setup):
    """k-token engine steps (one dispatch per k tokens) produce exactly the
    greedy tokens of k single steps, including mid-window finishes."""
    cfg, params = setup
    from llama3_quantization_tpu.serving.engine import ServingEngine

    prompts = [[3, 5, 7], [11, 2], [4, 4, 4, 4, 9]]
    lens = [7, 3, 10]  # one finishes mid-window at k=4

    # collect results without eviction-on-read interference
    def run_collect(step_tokens):
        eng = ServingEngine(params, cfg, max_slots=4, max_len=64)
        rids = [eng.add_request(p, max_new_tokens=n)
                for p, n in zip(prompts, lens)]
        eng.run(max_steps=50, step_tokens=step_tokens)
        return [list(eng.requests[r].generated) for r in rids]

    single = run_collect(1)
    multi = run_collect(4)
    assert single == multi
    for gen, n in zip(single, lens):
        assert len(gen) == n


def test_step_n_slot_reuse(setup):
    """A slot freed mid-window by step_n accepts a new request whose
    prefill splice overwrites the dead window writes."""
    cfg, params = setup
    from llama3_quantization_tpu.serving.engine import ServingEngine

    eng = ServingEngine(params, cfg, max_slots=1, max_len=64)
    r1 = eng.add_request([3, 5, 7], max_new_tokens=3)
    eng.run(max_steps=10, step_tokens=4)
    g1 = list(eng.requests[r1].generated)
    assert len(g1) == 3 and not eng._slot_req
    r2 = eng.add_request([3, 5, 7], max_new_tokens=3)
    eng.run(max_steps=10, step_tokens=4)
    g2 = list(eng.requests[r2].generated)
    assert g2 == g1  # same prompt, same greedy continuation


def test_run_pipelined_matches_sequential(setup):
    """The speculative window pipeline (round 4: window i+1 dispatched
    before window i's tokens are fetched) must produce byte-identical
    outputs to the sequential step_n loop — only the host-side timing of
    finish discovery changes, never the token chain — including slot
    reuse over speculative dead writes."""
    cfg, params = setup
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 5, 5, 5, 5], [2, 4, 6],
               [7, 7, 1], [3, 1, 4, 1, 5]]
    lens = [9, 5, 7, 12, 4, 6]
    k = 4

    eng_a = ServingEngine(params, cfg, max_slots=2, max_len=64)
    pend = list(zip(prompts, lens))

    def feed():
        batch = []
        while eng_a.free and len(batch) < len(eng_a.free) and pend:
            p, n = pend.pop()
            batch.append((p, n, None))
        if batch:
            eng_a.add_requests(batch)

    feed()
    rids_a = {}
    while eng_a._slot_req:
        eng_a.step_n(k)
        if eng_a.free and pend:
            feed()
    outs_a = {tuple(r.generated[: lens[i]]) for i, r in
              enumerate(sorted(eng_a.requests.values(), key=lambda r: r.rid))}

    eng_b = ServingEngine(params, cfg, max_slots=2, max_len=64)
    for p, n in zip(prompts, lens):
        eng_b.submit(p, n, None)
    eng_b.run_pipelined(k)
    outs_b = {tuple(r.generated[: lens[i]]) for i, r in
              enumerate(sorted(eng_b.requests.values(), key=lambda r: r.rid))}

    # the two schedulers admit in the same order; the truncated output
    # sets must match exactly
    assert outs_a == outs_b
    for r in eng_b.requests.values():
        assert len(r.generated) <= max(lens)


def test_run_pipelined_eos(setup):
    """eos finishes one window late in the pipeline but the reported
    generation still stops at eos (trailing speculative tokens dropped)."""
    cfg, params = setup
    probe = ServingEngine(params, cfg, max_slots=1, max_len=64)
    rid = probe.add_request([1, 2, 3], max_new_tokens=10)
    probe.run(step_tokens=2)
    seq = probe.result(rid)
    eos = seq[3]  # a token known to appear at position 3

    eng = ServingEngine(params, cfg, max_slots=1, max_len=64)
    eng.submit([1, 2, 3], 10, eos)
    eng.run_pipelined(2)
    got = list(eng.requests.values())[0].generated
    assert got == seq[:4]  # stops right after the eos token

def test_prefree_and_drain_clamp(setup):
    """Round-4 serving levers: (a) a budget-bound (eos-less) request's
    slot frees at DISPATCH time of its final window, so the replacement
    admits with no idle window; (b) the drain tail clamps the dispatch
    window to the largest remaining budget (rounded into _window_sizes),
    so tiny-budget requests dispatch tiny windows. Outputs must still be
    byte-identical to the reference single-sequence decode."""
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=1, max_len=64)
    assert eng._window_sizes(12) == [1, 2, 4, 8, 12]
    assert eng._window_sizes(8) == [1, 2, 4, 8]
    # one slot, two budget-bound requests: with k=8 > max_new=3 the clamp
    # dispatches 2+1 step windows (round-down, zero dead steps); pre-free
    # must hand the slot to request 2 as soon as request 1 is scheduled
    eng.submit([1, 2, 3, 4], 3, None)
    eng.submit([9, 8, 7], 3, None)
    eng.run_pipelined(8)
    gens = [r.generated for r in
            sorted(eng.requests.values(), key=lambda r: r.rid)]
    # the submit queue pops from the end (LIFO): [9,8,7] admits first
    assert gens[0] == _single_greedy(params, cfg, [9, 8, 7], 3)
    assert gens[1] == _single_greedy(params, cfg, [1, 2, 3, 4], 3)
    # every slot was freed exactly once per finish (no double-free)
    assert sorted(eng.free) == [0]
    assert all(r.done and r.freed for r in eng.requests.values())


def test_pipelined_ring_headroom_clamp_parity(setup):
    """Round 5: near the ring end, run_pipelined SHRINKS the window (the
    ring-headroom clamp) so the windowed fast path keeps fitting instead
    of collapsing to per-step dispatches. Streams must stay
    byte-identical to the sequential step_n loop on a ring the workload
    nearly fills (max_len 24, prompt+generation up to 21)."""
    cfg, params = setup
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    lens = [16, 14]  # pos reaches 21 / 17 on a 24-slot ring
    k = 8

    eng_a = ServingEngine(params, cfg, max_slots=2, max_len=24,
                          quantized_cache=8)
    for p, n in zip(prompts, lens):
        eng_a.add_request(p, max_new_tokens=n)
    while eng_a._slot_req:
        eng_a.step_n(k)
    outs_a = [list(eng_a.requests[r].generated) for r in sorted(eng_a.requests)]

    eng_b = ServingEngine(params, cfg, max_slots=2, max_len=24,
                          quantized_cache=8)
    for p, n in zip(prompts, lens):
        eng_b.submit(p, n, None)
    eng_b.run_pipelined(k)
    outs_b = [list(eng_b.requests[r].generated) for r in sorted(eng_b.requests)]
    # ljf admission may assign rids in budget order — compare unordered
    assert sorted(map(tuple, outs_a)) == sorted(map(tuple, outs_b))
    assert sorted(len(g) for g in outs_b) == sorted(lens)
