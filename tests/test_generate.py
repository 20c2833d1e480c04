"""On-device generation loop + MMLU rollup + profiling utils tests."""

import numpy as np
import jax
import jax.numpy as jnp

from llama3_quantization_tpu.models import (
    TINY_LLAMA,
    decode_step,
    init_kv_cache,
    init_params,
)
from llama3_quantization_tpu.models.transformer import greedy_generate


def test_greedy_generate_matches_python_loop():
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, cfg.vocab_size)
    N = 12

    # python-loop reference
    cache = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    logits, cache = decode_step(params, cache, prompt, jnp.int32(0), cfg)
    nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    ref = []
    pos = 4
    tok = nxt
    for _ in range(N):
        logits, cache = decode_step(params, cache, tok, jnp.int32(pos), cfg)
        out = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        ref.append(np.asarray(out))
        tok = out[:, None]
        pos += 1

    # scanned loop
    cache2 = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    logits2, cache2 = decode_step(params, cache2, prompt, jnp.int32(0), cfg)
    nxt2 = jnp.argmax(logits2[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    toks, _ = greedy_generate(params, cache2, nxt2, jnp.int32(4), N, cfg)
    got = np.asarray(toks)  # [B, N] tokens generated AFTER nxt2
    # scan emits argmax of each step's logits: step i consumes token i,
    # emits token i+1 -> got[:, i] == ref[i]
    for i in range(N):
        np.testing.assert_array_equal(got[:, i], ref[i])


def test_greedy_generate_quantized_cache():
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    cache = init_kv_cache(cfg, 1, 32, quantized=True)
    tok = jnp.zeros((1, 1), jnp.int32)
    toks, cache = greedy_generate(params, cache, tok, jnp.int32(0), 8, cfg)
    assert toks.shape == (1, 8)
    assert bool((toks >= 0).all()) and bool((toks < cfg.vocab_size).all())


def test_mmlu_rollup():
    from llama3_quantization_tpu.eval.mmlu_categories import mmlu_rollup

    res = {
        "hendrycksTest-anatomy": {"acc": 0.5},
        "hendrycksTest-college_physics": {"acc": 0.7},
        "hendrycksTest-philosophy": {"acc": 0.9},
        "other_task": {"acc": 0.1},
    }
    out = mmlu_rollup(res)
    assert out["mmlu_average"] == (0.5 + 0.7 + 0.9) / 3
    assert out["mmlu_STEM"] == 0.7
    assert out["mmlu_humanities"] == 0.9
    assert "mmlu_other (business, health, misc.)" in out


def test_throughput_accounting():
    from llama3_quantization_tpu.utils.profiling import Throughput

    t = Throughput(bytes_per_token=1e9, hbm_gbps=1000.0)
    t.start()
    import time

    time.sleep(0.01)
    t.stop(tokens=100)
    rep = t.report()
    assert rep["tokens"] == 100 and rep["tok_s"] > 0
    assert 0 < rep["speed_of_light_fraction"]


class TestSampling:
    def _setup(self):
        from llama3_quantization_tpu.models import (
            TINY_LLAMA, forward_logits, init_kv_cache, init_params,
        )
        from llama3_quantization_tpu.models.transformer import decode_step

        cfg = TINY_LLAMA
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        cache = init_kv_cache(cfg, batch=2, max_len=32)
        first = jnp.zeros((2, 1), jnp.int32)
        return cfg, params, cache, first

    def test_temperature_zero_is_greedy(self):
        from llama3_quantization_tpu.models import greedy_generate, sample_generate

        cfg, params, cache, first = self._setup()
        g, _ = greedy_generate(params, dict(cache), first, 0, 8, cfg)
        s, _ = sample_generate(
            params, dict(cache), first, 0, 8, cfg, jax.random.PRNGKey(7),
            temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(g), np.asarray(s))

    def test_top_k1_is_greedy(self):
        from llama3_quantization_tpu.models import greedy_generate, sample_generate

        cfg, params, cache, first = self._setup()
        g, _ = greedy_generate(params, dict(cache), first, 0, 8, cfg)
        s, _ = sample_generate(
            params, dict(cache), first, 0, 8, cfg, jax.random.PRNGKey(3),
            temperature=0.7, top_k=1,
        )
        np.testing.assert_array_equal(np.asarray(g), np.asarray(s))

    def test_sampling_seeded_deterministic_and_varied(self):
        from llama3_quantization_tpu.models import sample_generate

        cfg, params, cache, first = self._setup()
        a, _ = sample_generate(params, dict(cache), first, 0, 12, cfg,
                               jax.random.PRNGKey(1), temperature=1.5)
        b, _ = sample_generate(params, dict(cache), first, 0, 12, cfg,
                               jax.random.PRNGKey(1), temperature=1.5)
        c, _ = sample_generate(params, dict(cache), first, 0, 12, cfg,
                               jax.random.PRNGKey(2), temperature=1.5)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_top_p_masks_tail(self):
        from llama3_quantization_tpu.models import sample_logits

        # distribution: one dominant logit; top_p=0.5 must always pick it
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        for seed in range(5):
            tok = sample_logits(logits, jax.random.PRNGKey(seed),
                                temperature=2.0, top_p=0.5)
            assert int(tok[0]) == 0

    def test_top_k_restricts_support(self):
        from llama3_quantization_tpu.models import sample_logits

        logits = jnp.asarray([[3.0, 2.9, -10.0, -10.0]])
        seen = {
            int(sample_logits(logits, jax.random.PRNGKey(s), temperature=5.0, top_k=2)[0])
            for s in range(20)
        }
        assert seen <= {0, 1} and len(seen) == 2


class TestSpeculative:
    def _setup(self, draft_same: bool):
        from llama3_quantization_tpu.models import TINY_LLAMA, init_kv_cache, init_params

        cfg = TINY_LLAMA
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        draft = params if draft_same else init_params(cfg, jax.random.PRNGKey(9), dtype=jnp.float32)
        cache = init_kv_cache(cfg, batch=1, max_len=64)
        dcache = init_kv_cache(cfg, batch=1, max_len=64)
        return cfg, params, draft, cache, dcache

    def _run(self, draft_same, n_rounds=6, k=3):
        from llama3_quantization_tpu.models import (
            flatten_speculative, greedy_generate, speculative_generate,
        )

        cfg, params, draft, cache, dcache = self._setup(draft_same)
        first = jnp.zeros((1, 1), jnp.int32)
        toks, counts, *_ = speculative_generate(
            params, draft, dict(cache), dict(dcache), first, 0, n_rounds, k, cfg
        )
        spec = flatten_speculative(toks, counts)
        ref, _ = greedy_generate(params, dict(cache), first, 0, len(spec), cfg)
        return spec, np.asarray(ref)[0].tolist(), np.asarray(counts)

    def test_perfect_draft_accepts_mostly(self):
        """Draft == target: acceptance is (near-)full. Not exactly k+1 every
        round on a random tiny model: the draft scores tokens in S=1 steps
        and the target in S=k+1 chunks, so fp reduction order differs and
        near-tied argmaxes occasionally flip — the emitted sequence is
        still exactly the target's greedy stream."""
        spec, ref, counts = self._run(draft_same=True)
        assert spec == ref, (spec, ref)
        assert counts.max() == 4 and counts.mean() >= 2.5, counts

    def test_exactness_with_mismatched_draft(self):
        """Any draft model must still emit the target's exact greedy
        sequence — speculation only changes throughput."""
        spec, ref, counts = self._run(draft_same=False)
        assert spec == ref, (spec, ref)
        # a random draft should not accept everything
        assert counts.min() >= 1 and counts.max() <= 4

    def test_counts_accumulate_positionally(self):
        """Total emitted == sum(counts) and positions advance by counts."""
        from llama3_quantization_tpu.models import speculative_generate
        cfg, params, draft, cache, dcache = self._setup(False)
        first = jnp.zeros((1, 1), jnp.int32)
        toks, counts, _, _, pos = speculative_generate(
            params, draft, cache, dcache, first, 0, 4, 2, cfg
        )
        assert int(pos) == int(np.asarray(counts).sum())

    def test_batch_guard(self):
        from llama3_quantization_tpu.models import speculative_generate
        cfg, params, draft, cache, dcache = self._setup(True)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="batch=1"):
            speculative_generate(
                params, draft, cache, dcache, jnp.zeros((2, 1), jnp.int32), 0, 2, 2, cfg
            )
