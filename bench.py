#!/usr/bin/env python
"""Decode-throughput benchmark (the reference's `llama.py benchmark`
equivalent, `/root/reference/llama.py:409-464`, re-targeted at TPU).

Measures steady-state single-chip decode tokens/sec on a Llama-3-8B-
architecture model with W4 g128 packed weights running the Pallas fused
dequant-matmul path. Weights are synthetic (zero-egress container — no
checkpoint downloads); throughput depends only on shapes/layout.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": tokens/s, "unit": "tok/s", "vs_baseline": ...}
`vs_baseline` is the fraction of the HBM-bandwidth speed-of-light rate for
this model/format on this chip (1.0 == bytes-bound optimum; the reference
publishes no throughput numbers to compare against — SURVEY.md §6).
Diagnostics go to stderr.
"""

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


#: v5e HBM bandwidth (GB/s) for the speed-of-light denominator
HBM_GBPS = {"v5e": 819.0, "v5": 819.0}


def model_bytes_per_token(cfg, spec, cache_len: int, container_bits=None) -> float:
    """HBM bytes touched per decode step: packed decoder weights + scales +
    fp head/embed reads + KV cache. `container_bits` overrides the storage
    width (the a8 path stores sub-byte codes in int8 containers)."""
    d, i, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim_
    lin = (
        d * cfg.num_heads * hd
        + 2 * d * cfg.num_kv_heads * hd
        + cfg.num_heads * hd * d
        + 3 * d * i
    ) * cfg.num_layers
    w_bytes = lin * (container_bits or spec.n_bits) / 8
    gs = spec.group_size or 1
    scale_bytes = (lin / gs) * 8 if spec.group_size else 0  # f32 scale+zero
    lm_head = d * cfg.vocab_size * 2  # bf16
    kv = 2 * cfg.num_layers * cache_len * cfg.num_kv_heads * hd * 2
    return w_bytes + scale_bytes + lm_head + kv


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    from llama3_quantization_tpu.models import LLAMA3_8B, TINY_LLAMA
    from llama3_quantization_tpu.models.synthetic import init_quantized_params
    from llama3_quantization_tpu.models.transformer import decode_step, init_kv_cache
    from llama3_quantization_tpu.ops import matmul as mm
    from llama3_quantization_tpu.quant import QuantSpec

    cfg_name = os.environ.get("L3Q_BENCH_MODEL", "llama3-8b" if on_tpu else "tiny")
    # a8: weights as centered-int8 codes driving the native s8 MXU path —
    # measured at full HBM bandwidth on v5e, vs VPU-bound dequant kernels
    backend = os.environ.get("L3Q_BENCH_BACKEND", "a8" if on_tpu else "xla")
    cfg = LLAMA3_8B if cfg_name == "llama3-8b" else TINY_LLAMA
    spec = QuantSpec(n_bits=4, group_size=128 if cfg_name == "llama3-8b" else 32)
    cache_len = int(os.environ.get("L3Q_BENCH_CACHE", 512))
    decode_steps = int(os.environ.get("L3Q_BENCH_STEPS", 64))

    log(f"bench: model={cfg_name} backend={backend} W{spec.n_bits} g{spec.group_size}")
    mm.set_backend(backend)

    t0 = time.time()
    params = init_quantized_params(cfg, spec, pack=backend != "a8")
    if backend == "a8":
        # serving recode: per-column symmetric int8 containers -> one s8 dot
        # per linear at HBM speed-of-light (quant/serving.py)
        from llama3_quantization_tpu.quant.serving import recode_model_s8

        params = recode_model_s8(params, cfg)
    params = jax.block_until_ready(params)
    log(f"params built in {time.time()-t0:.1f}s")

    from llama3_quantization_tpu.models.transformer import greedy_generate

    cache = init_kv_cache(cfg, 1, cache_len)
    step = jax.jit(partial(decode_step, cfg=cfg), donate_argnums=(1,))
    gen = jax.jit(
        partial(greedy_generate, cfg=cfg, n_steps=decode_steps), donate_argnums=(1,)
    )

    tok = jnp.zeros((1, 1), jnp.int32)
    t0 = time.time()
    logits, cache = step(params, cache, tok, jnp.int32(0))
    _ = float(logits[0, 0, 0])
    log(f"first decode step (compile) in {time.time()-t0:.1f}s")

    # On-device generation loop: n tokens per dispatch, ONE host round-trip
    # per batch of steps (a scalar fetch forces real completion — this
    # backend's block_until_ready returns early, yielding impossible
    # >speed-of-light rates if trusted).
    nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    t0 = time.time()
    toks, cache = gen(params, cache, nxt, jnp.int32(1))
    _ = int(toks[0, -1])
    log(f"generate loop (compile+run) in {time.time()-t0:.1f}s")

    t0 = time.time()
    toks, cache = gen(params, cache, nxt, jnp.int32(1 + decode_steps))
    _ = int(toks[0, -1])
    dt = time.time() - t0
    tok_s = decode_steps / dt
    log(f"{decode_steps} generated tokens in {dt:.3f}s -> {tok_s:.2f} tok/s")

    if cfg_name == "llama3-8b":
        container = 8 if backend == "a8" else None
        bpt = model_bytes_per_token(cfg, spec, cache_len, container_bits=container)
        sol = HBM_GBPS["v5e"] * 1e9 / bpt
        log(f"bytes/token={bpt/1e9:.2f} GB, speed-of-light={sol:.1f} tok/s")
        vs = tok_s / sol
        metric = f"decode_tok_s_chip_llama3_8b_w4g128_{backend}"
    else:
        vs = 0.0
        metric = f"decode_tok_s_{cfg_name}_{backend}"

    print(json.dumps({"metric": metric, "value": round(tok_s, 2), "unit": "tok/s", "vs_baseline": round(vs, 4)}))


if __name__ == "__main__":
    main()
