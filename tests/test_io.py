"""Checkpoint I/O, HF-loader round-trip, CachingLM, Observer tests."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.models import TINY_LLAMA, forward_logits, init_params


def _write_fake_hf_llama(tmp_path, cfg):
    """Fabricate a minimal HF llama checkpoint dir (safetensors) matching
    TINY_LLAMA shapes."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    d, i, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim_
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((cfg.vocab_size, d)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones(d, np.float32),
        "lm_head.weight": rng.standard_normal((cfg.vocab_size, d)).astype(np.float32) * 0.02,
    }
    for l in range(cfg.num_layers):
        p = f"model.layers.{l}"
        tensors.update({
            f"{p}.self_attn.q_proj.weight": rng.standard_normal((cfg.num_heads * hd, d)).astype(np.float32) * 0.05,
            f"{p}.self_attn.k_proj.weight": rng.standard_normal((cfg.num_kv_heads * hd, d)).astype(np.float32) * 0.05,
            f"{p}.self_attn.v_proj.weight": rng.standard_normal((cfg.num_kv_heads * hd, d)).astype(np.float32) * 0.05,
            f"{p}.self_attn.o_proj.weight": rng.standard_normal((d, cfg.num_heads * hd)).astype(np.float32) * 0.05,
            f"{p}.mlp.gate_proj.weight": rng.standard_normal((i, d)).astype(np.float32) * 0.05,
            f"{p}.mlp.up_proj.weight": rng.standard_normal((i, d)).astype(np.float32) * 0.05,
            f"{p}.mlp.down_proj.weight": rng.standard_normal((d, i)).astype(np.float32) * 0.05,
            f"{p}.input_layernorm.weight": np.ones(d, np.float32),
            f"{p}.post_attention_layernorm.weight": np.ones(d, np.float32),
        })
    save_file(tensors, str(tmp_path / "model.safetensors"))
    config = {
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": d,
        "intermediate_size": i,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "tie_word_embeddings": False,
    }
    (tmp_path / "config.json").write_text(json.dumps(config))
    return tensors


def test_hf_loader_roundtrip(tmp_path):
    from llama3_quantization_tpu.models.hf_loader import from_hf_checkpoint

    cfg0 = TINY_LLAMA
    tensors = _write_fake_hf_llama(tmp_path, cfg0)
    params, cfg = from_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg.hidden_size == cfg0.hidden_size and cfg.num_layers == cfg0.num_layers
    # weights transposed to [in, out]
    np.testing.assert_allclose(
        np.asarray(params["layers"]["q"]["w"][0]),
        tensors["model.layers.0.self_attn.q_proj.weight"].T,
        rtol=1e-6,
    )
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0, cfg.vocab_size)
    out = forward_logits(params, toks, cfg)
    assert bool(jnp.isfinite(out).all())


def test_checkpoint_save_load(tmp_path):
    from llama3_quantization_tpu.models import quantize_model_rtn
    from llama3_quantization_tpu.models.hf_loader import load_checkpoint, save_checkpoint
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=32), pack=True)
    save_checkpoint(qp, cfg, str(tmp_path / "ckpt"))
    restored = load_checkpoint(str(tmp_path / "ckpt"), qp)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    np.testing.assert_allclose(
        np.asarray(forward_logits(restored, toks, cfg)),
        np.asarray(forward_logits(qp, toks, cfg)),
        rtol=1e-5,
    )


def test_caching_lm(tmp_path):
    from llama3_quantization_tpu.eval.harness import DummyLM
    from llama3_quantization_tpu.eval.harness.caching import CachingLM

    class CountingLM(DummyLM):
        calls = 0

        def loglikelihood(self, requests):
            CountingLM.calls += len(requests)
            return [(-1.0 * (i + 1), False) for i, _ in enumerate(requests)]

    lm = CachingLM(CountingLM(), str(tmp_path / "cache.db"))
    reqs = [("a", "b"), ("c", "d")]
    first = lm.loglikelihood(reqs)
    assert CountingLM.calls == 2
    second = lm.loglikelihood(reqs + [("e", "f")])
    assert CountingLM.calls == 3  # only the new request executed
    assert second[0] == first[0] and second[1] == first[1]


def test_observer():
    from llama3_quantization_tpu.quant.gptq import Observer

    ob = Observer(topk=2)
    ob.submit("q", 0, 1.0)
    ob.submit("k", 1, 5.0)
    ob.submit("v", 2, 3.0)
    items = ob.items()
    assert len(items) == 2 and items[0][2] == 5.0 and items[1][2] == 3.0
    assert "k.1" in ob.table()


def test_hf_loader_falcon_roundtrip(tmp_path):
    """Falcon checkpoint: fused query_key_value must split into q/k/v."""
    from safetensors.numpy import save_file

    from llama3_quantization_tpu.models.configs import TINY_FALCON
    from llama3_quantization_tpu.models.hf_loader import from_hf_checkpoint

    cfg = TINY_FALCON
    rng = np.random.default_rng(0)
    d, hd = cfg.hidden_size, cfg.head_dim_
    nq, nkv = cfg.num_heads * hd, cfg.num_kv_heads * hd
    tensors = {
        "transformer.word_embeddings.weight": rng.standard_normal((cfg.vocab_size, d)).astype(np.float32) * 0.02,
        "transformer.ln_f.weight": np.ones(d, np.float32),
        "transformer.ln_f.bias": np.zeros(d, np.float32),
        "lm_head.weight": rng.standard_normal((cfg.vocab_size, d)).astype(np.float32) * 0.02,
    }
    for l in range(cfg.num_layers):
        p = f"transformer.h.{l}"
        tensors.update({
            f"{p}.self_attention.query_key_value.weight": rng.standard_normal((nq + 2 * nkv, d)).astype(np.float32) * 0.05,
            f"{p}.self_attention.dense.weight": rng.standard_normal((d, nq)).astype(np.float32) * 0.05,
            f"{p}.mlp.dense_h_to_4h.weight": rng.standard_normal((cfg.intermediate_size, d)).astype(np.float32) * 0.05,
            f"{p}.mlp.dense_4h_to_h.weight": rng.standard_normal((d, cfg.intermediate_size)).astype(np.float32) * 0.05,
            f"{p}.input_layernorm.weight": np.ones(d, np.float32),
            f"{p}.input_layernorm.bias": np.zeros(d, np.float32),
        })
    save_file(tensors, str(tmp_path / "model.safetensors"))
    config = {
        "model_type": "falcon",
        "vocab_size": cfg.vocab_size,
        "hidden_size": d,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "multi_query": True,
        "parallel_attn": True,
        "max_position_embeddings": cfg.max_position_embeddings,
    }
    (tmp_path / "config.json").write_text(json.dumps(config))

    params, loaded_cfg = from_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert loaded_cfg.arch == "falcon" and loaded_cfg.num_kv_heads == 1
    qkv = tensors["transformer.h.0.self_attention.query_key_value.weight"]
    np.testing.assert_allclose(np.asarray(params["layers"]["q"]["w"][0]), qkv[:nq].T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layers"]["k"]["w"][0]), qkv[nq:nq+nkv].T, rtol=1e-6)
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0, cfg.vocab_size)
    out = forward_logits(params, toks, loaded_cfg)
    assert bool(jnp.isfinite(out).all())


def test_orbax_checkpoint_roundtrip(tmp_path):
    from llama3_quantization_tpu.models import quantize_model_rtn
    from llama3_quantization_tpu.models.hf_loader import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=32), pack=True)
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(qp, path)
    restored = load_checkpoint_orbax(path, qp)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    np.testing.assert_allclose(
        np.asarray(forward_logits(restored, toks, cfg)),
        np.asarray(forward_logits(qp, toks, cfg)),
        rtol=1e-5,
    )


def test_hf_loader_falcon_gqa_new_decoder(tmp_path):
    """Falcon-40B-style checkpoint: grouped QKV rows ([q.. k v] per KV
    group), dual ln_attn/ln_mlp norms, n_head_kv config key."""
    import dataclasses

    from safetensors.numpy import save_file

    from llama3_quantization_tpu.models.configs import TINY_FALCON
    from llama3_quantization_tpu.models.hf_loader import from_hf_checkpoint
    from llama3_quantization_tpu.models.transformer import forward_logits

    base = TINY_FALCON
    cfg = dataclasses.replace(base, num_kv_heads=2)
    rng = np.random.default_rng(0)
    d, hd, h, hkv = cfg.hidden_size, cfg.head_dim_, cfg.num_heads, cfg.num_kv_heads
    assert h % hkv == 0 and hkv > 1

    # known q/k/v, fused in the grouped layout
    q = rng.standard_normal((h * hd, d)).astype(np.float32) * 0.05
    k = rng.standard_normal((hkv * hd, d)).astype(np.float32) * 0.05
    v = rng.standard_normal((hkv * hd, d)).astype(np.float32) * 0.05
    group = h // hkv
    blocks = []
    for g in range(hkv):
        blocks.append(q.reshape(h, hd, d)[g * group : (g + 1) * group].reshape(-1, d))
        blocks.append(k.reshape(hkv, hd, d)[g].reshape(-1, d))
        blocks.append(v.reshape(hkv, hd, d)[g].reshape(-1, d))
    fused = np.concatenate(blocks, axis=0)

    tensors = {
        "transformer.word_embeddings.weight": rng.standard_normal((cfg.vocab_size, d)).astype(np.float32) * 0.02,
        "transformer.ln_f.weight": np.ones(d, np.float32),
        "transformer.ln_f.bias": np.zeros(d, np.float32),
        "lm_head.weight": rng.standard_normal((cfg.vocab_size, d)).astype(np.float32) * 0.02,
    }
    for l in range(cfg.num_layers):
        p = f"transformer.h.{l}"
        tensors.update({
            f"{p}.self_attention.query_key_value.weight": fused,
            f"{p}.self_attention.dense.weight": rng.standard_normal((d, h * hd)).astype(np.float32) * 0.05,
            f"{p}.mlp.dense_h_to_4h.weight": rng.standard_normal((cfg.intermediate_size, d)).astype(np.float32) * 0.05,
            f"{p}.mlp.dense_4h_to_h.weight": rng.standard_normal((d, cfg.intermediate_size)).astype(np.float32) * 0.05,
            f"{p}.ln_attn.weight": np.ones(d, np.float32),
            f"{p}.ln_attn.bias": np.zeros(d, np.float32),
            f"{p}.ln_mlp.weight": np.full(d, 1.5, np.float32),
            f"{p}.ln_mlp.bias": np.zeros(d, np.float32),
        })
    save_file(tensors, str(tmp_path / "model.safetensors"))
    config = {
        "model_type": "falcon",
        "vocab_size": cfg.vocab_size,
        "hidden_size": d,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": h,
        "n_head_kv": hkv,  # RefinedWeb-style key
        "multi_query": False,
        "new_decoder_architecture": True,
        "parallel_attn": True,
        "max_position_embeddings": cfg.max_position_embeddings,
    }
    (tmp_path / "config.json").write_text(json.dumps(config))

    params, loaded_cfg = from_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert loaded_cfg.num_kv_heads == hkv
    np.testing.assert_allclose(np.asarray(params["layers"]["q"]["w"][0]), q.T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layers"]["k"]["w"][0]), k.T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layers"]["v"]["w"][0]), v.T, rtol=1e-6)
    assert "ln2" in params["layers"]  # ln_mlp loaded
    out = forward_logits(params, jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0, cfg.vocab_size), loaded_cfg)
    assert bool(jnp.isfinite(out).all())


def test_profile_report_roundtrip(tmp_path):
    """Capture a tiny jax.profiler trace and aggregate it with the
    profile_report helpers (device table may be empty on pure-CPU traces;
    the loader and aggregator must still work)."""
    import jax
    import jax.numpy as jnp

    from llama3_quantization_tpu.utils.profiling import (
        device_op_table, format_op_table, load_trace_events, profile_trace)

    d = str(tmp_path / "trace")
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    _ = f(x)  # compile outside the trace
    with profile_trace(d):
        _ = float(f(x))
    events = load_trace_events(d)
    assert events, "trace should contain events"
    rows = device_op_table(events, top=5, steps=1)
    table = format_op_table(rows)
    assert isinstance(table, str) and table.splitlines()
