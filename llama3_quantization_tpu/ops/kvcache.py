"""Quantized KV cache.

The reference's KV cache is an eager fp16 concat
(`/root/reference/models/int_llama_layer.py:130-135`) with *runtime
fake-quant* of K/V before the attention matmuls. TPU-native version: the
cache itself is stored int8 (or int4-packed later) with per-(token, head)
symmetric scales in a preallocated ring buffer — halving (quartering) the
HBM bytes the decode step streams, which is exactly what bounds long-
context decode throughput.

Numerics: K/V are quantized once when written (per token), not re-quantized
per read; scores fold the scale after the int8 matmul, matching the
reference's symmetric `QuantMatMul` semantics (`quant/int_matmul.py`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def kv_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x [B, S, H, D] -> (codes int8, scale f32 [B, S, H, 1]), symmetric."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.clip(absmax / 127.0, 1e-8, None)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return codes, scale


def kv_dequantize(codes: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (codes.astype(jnp.float32) * scale).astype(dtype)


def init_quantized_kv_cache(cfg, batch: int, max_len: int) -> Dict[str, jax.Array]:
    """Preallocated int8 ring buffer + scales, stacked over layers."""
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim_)
    sshape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, 1)
    return {
        "k_q": jnp.zeros(shape, jnp.int8),
        "k_s": jnp.ones(sshape, jnp.float32),
        "v_q": jnp.zeros(shape, jnp.int8),
        "v_s": jnp.ones(sshape, jnp.float32),
    }


def cache_update(
    layer_cache: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    k_new: jax.Array,  # [B, S_step, H, D]
    v_new: jax.Array,
    pos: jax.Array,
):
    """Quantize and write new K/V at pos (scalar, or per-row vector [B] for
    multi-slot decode with S_step == 1); return updated layer cache."""
    kq, ks, vq, vs = layer_cache
    nk, nks = kv_quantize(k_new)
    nv, nvs = kv_quantize(v_new)
    if getattr(pos, "ndim", 0) == 1:
        rows = jnp.arange(kq.shape[0])
        kq = kq.at[rows, pos].set(nk[:, 0])
        ks = ks.at[rows, pos].set(nks[:, 0])
        vq = vq.at[rows, pos].set(nv[:, 0])
        vs = vs.at[rows, pos].set(nvs[:, 0])
        return kq, ks, vq, vs
    idx = (0, pos, 0, 0)
    kq = jax.lax.dynamic_update_slice(kq, nk, idx)
    ks = jax.lax.dynamic_update_slice(ks, nks, idx)
    vq = jax.lax.dynamic_update_slice(vq, nv, idx)
    vs = jax.lax.dynamic_update_slice(vs, nvs, idx)
    return kq, ks, vq, vs


def cache_read(layer_cache, dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Dequantized full K/V views [B, T, H, D]."""
    kq, ks, vq, vs = layer_cache
    return kv_dequantize(kq, ks, dtype), kv_dequantize(vq, vs, dtype)
