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


def init_quantized_kv_cache(
    cfg, batch: int, max_len: int, bits: int = 8
) -> Dict[str, jax.Array]:
    """Preallocated quantized ring buffer + scales, stacked over layers,
    heads-major [L, B, Hkv, T, *] (same reasoning as the fp cache: the
    decode dot reads it in place instead of transposing it every step).

    bits=8: one int8 code per element; bits=4: two codes per byte packed
    along head_dim (quarter the bf16 bytes)."""
    hd = cfg.head_dim_
    if bits == 4:
        if hd % 2:
            raise ValueError("int4 KV cache needs an even head_dim")
        hd = hd // 2
    elif bits != 8:
        raise ValueError("KV cache bits must be 4 or 8")
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, hd)
    sshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, 1)
    code_dtype = jnp.uint8 if bits == 4 else jnp.int8
    return {
        "k_q": jnp.zeros(shape, code_dtype),
        "k_s": jnp.ones(sshape, jnp.float32),
        "v_q": jnp.zeros(shape, code_dtype),
        "v_s": jnp.ones(sshape, jnp.float32),
    }


def kv4_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x [..., D] -> (packed uint8 [..., D/2], scale [..., 1]); asymmetric
    4-bit with a fixed zero of 8 (symmetric around it).

    Packing pairs element j with element j + D/2 (split halves, NOT
    even/odd interleave): unpacking is then a lane-dim CONCAT of the two
    nibble planes — cheap on the TPU VPU — which is what the in-kernel
    unpack in `ops/decode_attention.py` relies on."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.clip(absmax / 7.0, 1e-8, None)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale) + 8, 0, 15).astype(
        jnp.uint8
    )
    half = codes.shape[-1] // 2
    lo = codes[..., :half]
    hi = codes[..., half:]
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def kv4_dequantize(packed: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    lo = (packed & 0xF).astype(jnp.float32) - 8.0
    hi = (packed >> 4).astype(jnp.float32) - 8.0
    vals = jnp.concatenate([lo, hi], axis=-1)
    return (vals * scale).astype(dtype)


def cache_update(
    layer_cache: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    k_new: jax.Array,  # [B, S_step, H, D]
    v_new: jax.Array,
    pos: jax.Array,
):
    """Quantize and write new K/V [B, S, H, D] into the heads-major cache
    [B, H, T, *] at pos (scalar, or per-row vector [B] for multi-slot
    decode with S_step == 1); return updated layer cache. int4 caches
    (uint8 codes, packed head_dim) are detected by shape."""
    kq, ks, vq, vs = layer_cache
    k_new = jnp.swapaxes(k_new, 1, 2)  # [B, H, S, D]
    v_new = jnp.swapaxes(v_new, 1, 2)
    if kq.shape[-1] != k_new.shape[-1]:  # int4-packed cache
        nk, nks = kv4_quantize(k_new)
        nv, nvs = kv4_quantize(v_new)
    else:
        nk, nks = kv_quantize(k_new)
        nv, nvs = kv_quantize(v_new)
    if getattr(pos, "ndim", 0) == 1:
        rows = jnp.arange(kq.shape[0])
        # advanced indices (rows, pos) around the H slice -> [B, H, *]
        kq = kq.at[rows, :, pos, :].set(nk[:, :, 0])
        ks = ks.at[rows, :, pos, :].set(nks[:, :, 0])
        vq = vq.at[rows, :, pos, :].set(nv[:, :, 0])
        vs = vs.at[rows, :, pos, :].set(nvs[:, :, 0])
        return kq, ks, vq, vs
    idx = (0, 0, pos, 0)
    kq = jax.lax.dynamic_update_slice(kq, nk, idx)
    ks = jax.lax.dynamic_update_slice(ks, nks, idx)
    vq = jax.lax.dynamic_update_slice(vq, nv, idx)
    vs = jax.lax.dynamic_update_slice(vs, nvs, idx)
    return kq, ks, vq, vs


def cache_update_stacked(stacked, layer, k_new: jax.Array, v_new: jax.Array, pos):
    """Quantize and write new K/V [B, S, H, D] into the LAYER-STACKED cache
    [L, B, H, T, *] at (layer, pos). Writes only the token slot(s): inside
    a decode layer-scan that carries the stacked buffers, this is an
    in-place dynamic-update-slice — no per-layer cache slice is ever
    materialized (vs the xs/ys scan streaming that copied the full cache
    every step, round-1 b8 trace)."""
    kq, ks, vq, vs = stacked
    k_new = jnp.swapaxes(k_new, 1, 2)  # [B, H, S, D]
    v_new = jnp.swapaxes(v_new, 1, 2)
    if kq.shape[-1] != k_new.shape[-1]:  # int4-packed cache
        nk, nks = kv4_quantize(k_new)
        nv, nvs = kv4_quantize(v_new)
    else:
        nk, nks = kv_quantize(k_new)
        nv, nvs = kv_quantize(v_new)
    if getattr(pos, "ndim", 0) == 1:
        # multi-slot decode: one dynamic-update-slice per row instead of a
        # row-indexed scatter — advanced indexing over (row, pos) with a
        # slice dim between produces a scatter XLA does NOT alias into the
        # scan carry (a full-cache copy per step; serve bench measured
        # 129 vs 364 tok/s), while a chain of B tiny DUS writes updates
        # the carried buffers in place.
        for b in range(kq.shape[1]):
            i = (layer, b, 0, pos[b], 0)
            kq = jax.lax.dynamic_update_slice(kq, nk[None, b : b + 1], i)
            ks = jax.lax.dynamic_update_slice(ks, nks[None, b : b + 1], i)
            vq = jax.lax.dynamic_update_slice(vq, nv[None, b : b + 1], i)
            vs = jax.lax.dynamic_update_slice(vs, nvs[None, b : b + 1], i)
        return kq, ks, vq, vs
    idx = (layer, 0, 0, pos, 0)
    kq = jax.lax.dynamic_update_slice(kq, nk[None], idx)
    ks = jax.lax.dynamic_update_slice(ks, nks[None], idx)
    vq = jax.lax.dynamic_update_slice(vq, nv[None], idx)
    vs = jax.lax.dynamic_update_slice(vs, nvs[None], idx)
    return kq, ks, vq, vs


def cache_read(layer_cache, dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Dequantized full K/V views, heads-major [B, H, T, D]."""
    kq, ks, vq, vs = layer_cache
    if kq.dtype == jnp.uint8:  # int4-packed
        return kv4_dequantize(kq, ks, dtype), kv4_dequantize(vq, vs, dtype)
    return kv_dequantize(kq, ks, dtype), kv_dequantize(vq, vs, dtype)
