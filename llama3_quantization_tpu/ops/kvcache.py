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
    tq = max_len
    if bits == 4:
        if max_len % 2:
            raise ValueError("int4 KV cache needs an even max_len")
        tq = max_len // 2  # two T-adjacent tokens per byte (kv4_pack)
    elif bits != 8:
        raise ValueError("KV cache bits must be 4 or 8")
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, tq, hd)
    sshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, 1)
    code_dtype = jnp.uint8 if bits == 4 else jnp.int8
    return {
        "k_q": jnp.zeros(shape, code_dtype),
        "k_s": jnp.ones(sshape, jnp.float32),
        "v_q": jnp.zeros(shape, code_dtype),
        "v_s": jnp.ones(sshape, jnp.float32),
    }


def kv4_codes(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x [..., T, D] -> (signed codes int8 [..., T, D] in [-7, 7],
    scale f32 [..., T, 1]); symmetric per (token, head)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.clip(absmax / 7.0, 1e-8, None)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -7, 7).astype(jnp.int8)
    return codes, scale


def kv4_pack(codes: jax.Array) -> jax.Array:
    """Signed codes [..., T, D] (T even) -> packed uint8 [..., T/2, D]:
    byte row r = (c[2r] & 15) | (c[2r+1] << 4) along the TOKEN axis.

    This is exactly Mosaic's i8 -> i4 bitcast layout (pairs of sublane
    rows per byte, natural order restored by the bitcast), so the decode
    kernel feeds the packed bytes to the int4 MXU with ZERO per-element
    unpack work (`ops/decode_attention.py`); everything off the kernel
    path unpacks with `kv4_unpack`."""
    lo = codes[..., 0::2, :].astype(jnp.uint8) & 0xF
    hi = (codes[..., 1::2, :].astype(jnp.uint8) & 0xF) << 4
    return lo | hi


def kv4_unpack_codes(packed: jax.Array) -> jax.Array:
    """Packed uint8 [..., T/2, D] -> signed int8 codes [..., T, D]."""
    lo = (((packed & 0xF) ^ 8).astype(jnp.int8) - 8)[..., None, :]
    hi = (((packed >> 4) ^ 8).astype(jnp.int8) - 8)[..., None, :]
    inter = jnp.concatenate([lo, hi], axis=-2)  # [..., T/2, 2, D]
    return inter.reshape(*packed.shape[:-2], packed.shape[-2] * 2, packed.shape[-1])


def kv4_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x [..., T, D] (T even) -> (packed uint8 [..., T/2, D], scale
    [..., T, 1]): quantize + T-pair pack in one call."""
    codes, scale = kv4_codes(x)
    return kv4_pack(codes), scale


def kv4_dequantize(packed: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Packed [..., T/2, D] + scale [..., T, 1] -> [..., T, D]."""
    vals = kv4_unpack_codes(packed).astype(jnp.float32)
    return (vals * scale).astype(dtype)


def _kv4_write(buf: jax.Array, codes: jax.Array, pos, lead=()):
    """Write signed int4 codes [B, H, S, D] into the T-packed buffer
    `buf` [*lead-selected*, B, H, T/2, D] at token position `pos`
    (scalar). `lead` is a tuple of leading scalar indices (the stacked
    layer axis). Nibble read-modify-write on the shared byte rows."""
    b, h, s, d = codes.shape
    tp = buf.shape[len(lead) + 2]
    if s == 1:
        row = pos // 2
        par = pos % 2
        old = jax.lax.dynamic_slice(
            buf, lead + (0, 0, row, 0), (1,) * len(lead) + (b, h, 1, d)
        )
        cu = codes.astype(jnp.uint8) & 0xF
        cu = cu.reshape(old.shape)
        merged = jnp.where(par == 0, (old & 0xF0) | cu, (old & 0x0F) | (cu << 4))
        return jax.lax.dynamic_update_slice(buf, merged, lead + (0, 0, row, 0))
    # S-token span at dynamic parity: unpack the covering byte rows,
    # splice, repack (spans are small — a prefill bucket or a speculative
    # window). The +1 covers a span starting at odd parity; when the span
    # IS the whole cache (s == 2*tp) pos can only be 0 (even), so clamp —
    # r = tp + 1 would exceed the packed token dim and fail at trace time
    # (advisor round-3 finding)
    r = min(s // 2 + 1, tp)
    r0 = jnp.clip(pos // 2, 0, tp - r)
    old = jax.lax.dynamic_slice(
        buf, lead + (0, 0, r0, 0), (1,) * len(lead) + (b, h, r, d)
    )
    old = old.reshape(b, h, r, d)
    unpacked = kv4_unpack_codes(old)  # [B, H, 2R, D]
    off = pos - 2 * r0
    unpacked = jax.lax.dynamic_update_slice(unpacked, codes, (0, 0, off, 0))
    repacked = kv4_pack(unpacked).reshape((1,) * len(lead) + (b, h, r, d))
    return jax.lax.dynamic_update_slice(buf, repacked, lead + (0, 0, r0, 0))


def cache_update(
    layer_cache: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    k_new: jax.Array,  # [B, S_step, H, D]
    v_new: jax.Array,
    pos: jax.Array,
):
    """Quantize and write new K/V [B, S, H, D] into the heads-major cache
    [B, H, T, *] at pos (scalar, or per-row vector [B] for multi-slot
    decode with S_step == 1); return updated layer cache. int4 caches
    (uint8 dtype, T-pair-packed rows — `kv4_pack`) are detected by
    dtype."""
    kq, ks, vq, vs = layer_cache
    k_new = jnp.swapaxes(k_new, 1, 2)  # [B, H, S, D]
    v_new = jnp.swapaxes(v_new, 1, 2)
    int4 = kq.dtype == jnp.uint8
    if int4:
        nk, nks = kv4_codes(k_new)
        nv, nvs = kv4_codes(v_new)
    else:
        nk, nks = kv_quantize(k_new)
        nv, nvs = kv_quantize(v_new)
    if getattr(pos, "ndim", 0) == 1:
        rows = jnp.arange(kq.shape[0])
        if int4:
            # per-row nibble RMW chain (multi-slot decode, S == 1)
            kq = _kv4_write_rows(kq, nk, pos)
            vq = _kv4_write_rows(vq, nv, pos)
        else:
            # advanced indices (rows, pos) around the H slice -> [B, H, *]
            kq = kq.at[rows, :, pos, :].set(nk[:, :, 0])
            vq = vq.at[rows, :, pos, :].set(nv[:, :, 0])
        ks = ks.at[rows, :, pos, :].set(nks[:, :, 0])
        vs = vs.at[rows, :, pos, :].set(nvs[:, :, 0])
        return kq, ks, vq, vs
    if int4:
        kq = _kv4_write(kq, nk, pos)
        vq = _kv4_write(vq, nv, pos)
    else:
        idx = (0, 0, pos, 0)
        kq = jax.lax.dynamic_update_slice(kq, nk, idx)
        vq = jax.lax.dynamic_update_slice(vq, nv, idx)
    sidx = (0, 0, pos, 0)
    ks = jax.lax.dynamic_update_slice(ks, nks, sidx)
    vs = jax.lax.dynamic_update_slice(vs, nvs, sidx)
    return kq, ks, vq, vs


def _kv4_write_rows(buf: jax.Array, codes: jax.Array, pos: jax.Array) -> jax.Array:
    """Multi-slot int4 write: codes [B, H, 1, D] at per-row positions
    `pos` [B] into buf [B, H, T/2, D] — a chain of per-row nibble RMWs."""
    for b in range(buf.shape[0]):
        row = pos[b] // 2
        par = pos[b] % 2
        old = jax.lax.dynamic_slice(
            buf, (b, 0, row, 0), (1, buf.shape[1], 1, buf.shape[3])
        )
        cu = (codes[b : b + 1].astype(jnp.uint8) & 0xF).reshape(old.shape)
        merged = jnp.where(par == 0, (old & 0xF0) | cu, (old & 0x0F) | (cu << 4))
        buf = jax.lax.dynamic_update_slice(buf, merged, (b, 0, row, 0))
    return buf


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
    int4 = kq.dtype == jnp.uint8  # T-pair-packed rows (kv4_pack)
    if int4:
        nk, nks = kv4_codes(k_new)
        nv, nvs = kv4_codes(v_new)
    else:
        nk, nks = kv_quantize(k_new)
        nv, nvs = kv_quantize(v_new)

    def rmw4(buf, new, b, row, par):
        old = jax.lax.dynamic_slice(
            buf, (layer, b, 0, row, 0), (1, 1, buf.shape[2], 1, buf.shape[4])
        )
        cu = (new[None, b : b + 1].astype(jnp.uint8) & 0xF).reshape(old.shape)
        merged = jnp.where(par == 0, (old & 0xF0) | cu, (old & 0x0F) | (cu << 4))
        return jax.lax.dynamic_update_slice(buf, merged, (layer, b, 0, row, 0))

    if getattr(pos, "ndim", 0) == 1:
        # multi-slot decode: one dynamic-update-slice per row instead of a
        # row-indexed scatter — advanced indexing over (row, pos) with a
        # slice dim between produces a scatter XLA does NOT alias into the
        # scan carry (a full-cache copy per step; serve bench measured
        # 129 vs 364 tok/s), while a chain of B tiny DUS writes updates
        # the carried buffers in place. int4 rows nibble-RMW the shared
        # byte row.
        for b in range(kq.shape[1]):
            i = (layer, b, 0, pos[b], 0)
            if int4:
                row, par = pos[b] // 2, pos[b] % 2
                kq = rmw4(kq, nk, b, row, par)
                vq = rmw4(vq, nv, b, row, par)
            else:
                kq = jax.lax.dynamic_update_slice(kq, nk[None, b : b + 1], i)
                vq = jax.lax.dynamic_update_slice(vq, nv[None, b : b + 1], i)
            ks = jax.lax.dynamic_update_slice(ks, nks[None, b : b + 1], i)
            vs = jax.lax.dynamic_update_slice(vs, nvs[None, b : b + 1], i)
        return kq, ks, vq, vs
    if int4:
        kq = _kv4_write(kq, nk, pos, lead=(layer,))
        vq = _kv4_write(vq, nv, pos, lead=(layer,))
    else:
        idx = (layer, 0, 0, pos, 0)
        kq = jax.lax.dynamic_update_slice(kq, nk[None], idx)
        vq = jax.lax.dynamic_update_slice(vq, nv[None], idx)
    sidx = (layer, 0, 0, pos, 0)
    ks = jax.lax.dynamic_update_slice(ks, nks[None], sidx)
    vs = jax.lax.dynamic_update_slice(vs, nvs[None], sidx)
    return kq, ks, vq, vs


def cache_read(layer_cache, dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Dequantized full K/V views, heads-major [B, H, T, D]."""
    kq, ks, vq, vs = layer_cache
    if kq.dtype == jnp.uint8:  # int4-packed
        return kv4_dequantize(kq, ks, dtype), kv4_dequantize(vq, vs, dtype)
    return kv_dequantize(kq, ks, dtype), kv_dequantize(vq, vs, dtype)
