"""Functional decoder-only transformer (Llama-3 / OPT families).

TPU-first re-design of the reference's quantized HF module trees
(`/root/reference/models/int_llama_layer.py`, `int_opt_layer.py`): instead of
swapping nn.Modules, the model is a pure function over a parameter pytree in
which any linear weight may be a `jax.Array` (fp) or a `QuantizedTensor`
(real-quant). Activation/KV quantization behavior is carried by a static
`RuntimeQuantConfig` so the whole forward jits to one XLA program.

Key TPU idioms (vs the reference's eager loops):
- layers are *stacked* along a leading axis and executed with `lax.scan`
  (one compiled layer body regardless of depth);
- the full-sequence path materializes no python-level per-layer state;
- decode uses a preallocated KV ring buffer updated with
  `lax.dynamic_update_slice` — not the reference's `torch.cat` concat
  anti-pattern (`int_llama_layer.py:130-135`);
- softmax in fp32, matmuls in bf16 with fp32 accumulation.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.matmul import qlinear
from ..quant.quantizer import QuantSpec, fake_quant_dynamic
from .configs import ModelConfig

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RuntimeQuantConfig:
    """Static activation/attention quantization switches.

    Mirrors the six quantizer-param dicts the reference assembles at
    `main.py:317-353` (weight / act / q / k / v / p): weight quantization is
    a *storage* property (QuantizedTensor in the pytree), the rest are
    runtime fake-quant hooks.
    """

    act: Optional[QuantSpec] = None  # linear-layer inputs
    q: Optional[QuantSpec] = None  # query before QK^T
    k: Optional[QuantSpec] = None  # key before QK^T
    v: Optional[QuantSpec] = None  # value before PV
    p: Optional[QuantSpec] = None  # softmax probs before PV (metric fix0to1)

    @staticmethod
    def off() -> "RuntimeQuantConfig":
        return RuntimeQuantConfig()


NO_QUANT = RuntimeQuantConfig.off()


def _maybe_fq(x: jax.Array, spec: Optional[QuantSpec]) -> jax.Array:
    if spec is None or not spec.enabled:
        return x
    return fake_quant_dynamic(x, spec)


# ---------------------------------------------------------------------------
# Norms — functional versions of OmniLayerNorm / OmniLlamaRMSNorm
# (`/root/reference/quant/omni_norm.py:11-63`): fp32 statistics, learnable
# weight/bias that LET scales can be folded into.
# ---------------------------------------------------------------------------


def rms_norm(
    x: jax.Array, weight: jax.Array, eps: float, bias: Optional[jax.Array] = None
) -> jax.Array:
    """RMSNorm with an optional bias — the reference's `OmniLlamaRMSNorm`
    grows a bias so LET shifts can fold into it (`quant/omni_norm.py:40-63`)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# RoPE (HF llama convention, so HF checkpoints reproduce bit-compatible
# scores; cf. reference use of `apply_rotary_pos_emb`,
# `models/int_llama_layer.py:124-125`).
# ---------------------------------------------------------------------------


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float, dtype, scaling=None
) -> Tuple[jax.Array, jax.Array]:
    """positions [*, S] -> cos/sin [*, S, head_dim].

    `scaling` is `ModelConfig.rope_scaling_`: None, or a tuple
    (type, factor, low_freq_factor, high_freq_factor, original_max_pos)
    implementing HF's `rope_scaling` — "linear" divides all frequencies by
    `factor`; "llama3" is the Llama-3.1 NTK-by-parts rule (long wavelengths
    scaled by `factor`, short kept, smooth interpolation between), matching
    transformers' `_compute_llama3_parameters` so 3.1 checkpoints reproduce
    HF logits.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if scaling is not None:
        kind, factor, low_ff, high_ff, old_max = scaling
        if kind == "linear":
            inv_freq = inv_freq / factor
        elif kind == "llama3":
            wavelen = 2 * jnp.pi / inv_freq
            low_wl, high_wl = old_max / low_ff, old_max / high_ff
            scaled = jnp.where(wavelen > low_wl, inv_freq / factor, inv_freq)
            smooth = (old_max / wavelen - low_ff) / (high_ff - low_ff)
            smoothed = (1 - smooth) * scaled / factor + smooth * scaled
            medium = (wavelen >= high_wl) & (wavelen <= low_wl)
            inv_freq = jnp.where(medium, smoothed, scaled)
        else:
            raise ValueError(f"unsupported rope scaling type {kind!r}")
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [*, S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, H, D]; cos/sin: [B or 1, S, D]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[..., None, :] + rotated * sin[..., None, :]


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

#: process-global switch for the Pallas flash-attention full-sequence path
#: ("auto" = on TPU only; the eager path always serves decode and any
#: configuration with q/k/v/p quantization hooks, which flash cannot host).
_FLASH = "auto"


def set_flash(mode) -> None:
    global _FLASH
    if mode not in (True, False, "auto"):
        raise ValueError(mode)
    _FLASH = mode


def _flash_enabled(rq: RuntimeQuantConfig) -> bool:
    if any(spec is not None for spec in (rq.q, rq.k, rq.v, rq.p)):
        return False
    if _FLASH == "auto":
        return jax.default_backend() == "tpu"
    return bool(_FLASH)


def _flash_attention(q, k, v, cfg: ModelConfig) -> jax.Array:
    """Causal blockwise attention via the Pallas TPU flash kernel — the
    full-sequence path; avoids materializing the [S, S] score matrix that
    the reference's eager attention allocates
    (`models/int_llama_layer.py:143-163`; SURVEY.md §5 long-context)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    b, s, h, d = q.shape
    rep = h // k.shape[2]
    qh = q.transpose(0, 2, 1, 3)
    kh = jnp.repeat(k.transpose(0, 2, 1, 3), rep, axis=1)
    vh = jnp.repeat(v.transpose(0, 2, 1, 3), rep, axis=1)
    out = flash_attention(qh, kh, vh, causal=True, sm_scale=1.0 / math.sqrt(d))
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def _attention(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,  # [B, T, Hkv, D] (or [B, Hkv, T, D] with kv_heads_major)
    v: jax.Array,  # same layout as k
    mask: Optional[jax.Array],  # [S, T] additive fp32 mask or None
    cfg: ModelConfig,
    rq: RuntimeQuantConfig,
    allow_flash: bool = False,
    kv_heads_major: bool = False,
) -> jax.Array:
    """Eager attention with the reference's quantization hook points: Q/K
    fake-quant before QK^T, probs/V before PV
    (`models/int_llama_layer.py:141-163`). GQA via head-group einsum instead
    of repeat_kv materialization.

    `kv_heads_major` is the KV-cache decode layout ([B, Hkv, T, D]): the
    dot's batch dims (b, g) are then majormost, so XLA reads the cache
    in place — the seq-major layout forces a strided whole-cache transpose
    copy every step (measured 26x slower at T=4096)."""
    if allow_flash and q.shape[1] >= 128 and _flash_enabled(rq):
        return _flash_attention(q, k, v, cfg)
    b, s, h, d = q.shape
    g = k.shape[1] if kv_heads_major else k.shape[2]
    rep = h // g
    q = _maybe_fq(q, rq.q)
    k = _maybe_fq(k, rq.k)  # last-axis (D) reduction: layout-independent
    qg = q.reshape(b, s, g, rep, d)
    kd = "bgtd" if kv_heads_major else "btgd"
    scores = jnp.einsum(
        f"bsgrd,{kd}->bgrst", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores / jnp.sqrt(d).astype(jnp.float32)
    if mask is not None:
        if mask.ndim == 3:  # per-batch-row mask [B, S, T] (multi-slot decode)
            scores = scores + mask[:, None, None]
        else:
            scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = _maybe_fq(probs, rq.p).astype(q.dtype)
    v = _maybe_fq(v, rq.v)
    out = jnp.einsum(
        f"bgrst,{kd}->bsgrd", probs, v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, s, h, d).astype(q.dtype)


def causal_mask(s: int, t: Optional[int] = None, offset: int = 0) -> jax.Array:
    """Additive causal mask [s, t]; query i attends key j iff j <= i+offset."""
    t = t or s
    qi = jnp.arange(s)[:, None] + offset
    kj = jnp.arange(t)[None, :]
    return jnp.where(kj <= qi, 0.0, -jnp.inf).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------


def _write_cache(buf: jax.Array, new: jax.Array, pos) -> jax.Array:
    """Write `new` [B, s, H, D] into the heads-major cache [B, H, T, D] at
    position `pos` — a scalar (shared slot) or a per-row vector [B]
    (multi-slot decode, s == 1). Only the written slice transposes (tiny at
    decode); reads then need no layout change at all."""
    new = jnp.swapaxes(new, 1, 2)  # [B, H, s, D]
    if getattr(pos, "ndim", 0) == 1:
        b = buf.shape[0]
        # advanced indices (rows, pos) around the H slice -> result [B, H, D]
        return buf.at[jnp.arange(b), :, pos, :].set(new[:, :, 0])
    return jax.lax.dynamic_update_slice(buf, new, (0, 0, pos, 0))


def _write_cache_stacked(buf: jax.Array, new: jax.Array, layer, pos) -> jax.Array:
    """Write `new` [B, s, H, D] into the LAYER-STACKED fp cache
    [L, B, H, T, D] at (layer, pos). Only the token slot is written: with
    the stacked buffer carried through the decode layer-scan this is an
    in-place dynamic-update-slice (the xs/ys streaming form copied the
    whole cache every step — round-1 b8 trace, two ~0.41 ms copies)."""
    new = jnp.swapaxes(new, 1, 2)  # [B, H, s, D]
    if getattr(pos, "ndim", 0) == 1:
        # per-row DUS chain, not a row-indexed scatter: the scatter is not
        # aliased into the scan carry (full-cache copy per step) — see
        # ops/kvcache.cache_update_stacked
        for b in range(buf.shape[1]):
            buf = jax.lax.dynamic_update_slice(
                buf, new[None, b : b + 1], (layer, b, 0, pos[b], 0)
            )
        return buf
    return jax.lax.dynamic_update_slice(buf, new[None], (layer, 0, 0, pos, 0))


#: int8-KV flash-decode kernel switch ("auto" = on TPU when applicable;
#: "interpret" runs the kernel interpreted for CPU tests; False = XLA
#: dequant path). The raw pallas_call is not partition-aware (pjit cannot
#: shard the custom call); under a tensor/data-sharded decode set a decode
#: mesh (`set_decode_mesh`) and the call is shard_map-wrapped instead.
_DECODE_KERNEL = "auto"

#: Mesh for partition-aware flash decode (None = single-replica). With a
#: mesh set, kernel calls are wrapped in `jax.shard_map` — batch rows on
#: the `dp` axis, KV head groups on `tp` — which is sound because the
#: kernel grid is embarrassingly parallel over (B, G); only the cache T
#: axis (reduced by the online softmax) must stay local.
_DECODE_MESH = None


def set_decode_kernel(mode) -> None:
    global _DECODE_KERNEL
    if mode not in (True, False, "auto", "interpret"):
        raise ValueError(mode)
    _DECODE_KERNEL = mode


#: int8-KV decode attention formulation: "xla" = codes-direct batched XLA
#: dots (`ops/decode_attention.xla_decode_gqa_s8*` — on this libtpu every
#: Pallas formulation is DMA-capped at ~0.3-0.4 of the HBM bus while XLA
#: dots stream 0.83-1.0, docs/BENCH_NOTES.md round 4); "kernel" = the
#: Pallas flash-decode kernel; "auto" = xla for int8 caches on TPU, kernel
#: otherwise. int4 (uint8-packed) caches always use the kernel — XLA has
#: no free nibble bitcast, unpacking would materialize the cache.
_DECODE_ATTN = __import__("os").environ.get("L3Q_DECODE_ATTN", "auto")


def set_decode_attn(mode) -> None:
    global _DECODE_ATTN
    if mode not in ("auto", "xla", "kernel"):
        raise ValueError(mode)
    _DECODE_ATTN = mode


def _use_xla_attn(cache_dtype) -> bool:
    """Route the int8-KV decode attention through the XLA codes-direct
    dots instead of the Pallas kernel? (int4 never: see _DECODE_ATTN.)"""
    if cache_dtype != jnp.int8 or _DECODE_ATTN == "kernel":
        return False
    if _DECODE_ATTN == "xla":
        return True
    return jax.default_backend() == "tpu" and _DECODE_KERNEL != "interpret"


def set_decode_mesh(mesh) -> None:
    """Enable the flash-decode kernel under tensor/data-sharded decode.

    `mesh` is a `jax.sharding.Mesh` with axes named "dp"/"tp" (either may
    be absent or size 1, e.g. the framework's `parallel.make_mesh`). Pass
    None to return to single-replica kernel dispatch. When the sharded
    shapes don't divide the mesh (batch % dp, kv_heads % tp) the decode
    step silently falls back to the eager XLA path, which GSPMD partitions
    on its own."""
    global _DECODE_MESH
    _DECODE_MESH = mesh


def _sharded_decode(fd, b: int, g: int, quantized: bool, stacked: bool = False):
    """shard_map-wrap a flash-decode call over the decode mesh. Returns the
    wrapped callable, or None when (b, g) don't divide the mesh axes — the
    caller then takes the eager path rather than risk an unpartitioned
    pallas_call being replicated (with its full-cache all-gather) by GSPMD."""
    mesh = _DECODE_MESH
    names = set(mesh.axis_names)
    dpa = "dp" if "dp" in names else None
    tpa = "tp" if "tp" in names else None
    if dpa is None and tpa is None:
        return None  # unknown axis naming — take the eager path
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    if b % dp or g % tp:
        return None
    from jax.sharding import PartitionSpec as P

    q_spec = P(dpa, None, tpa, None)  # [B, 1, Hq, D]: heads chunk == group chunk
    # [B, G, T, *] — or [L, B, G, T, *] with the layer axis replicated
    kv_spec = P(None, dpa, tpa, None, None) if stacked else P(dpa, tpa, None, None)
    in_specs = (q_spec,) + (kv_spec,) * (4 if quantized else 2) + (P(dpa, None),)
    if stacked:
        in_specs = in_specs + (P(),)  # the scalar layer index, replicated
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # metadata; the wrapper has no collectives, so the check adds nothing
    return jax.shard_map(
        fd, mesh=mesh, in_specs=in_specs, out_specs=q_spec, check_vma=False
    )


def _decode_kernel_ok(rq: RuntimeQuantConfig, cache, s: int) -> bool:
    """Route the cached decode step through the Pallas flash-decode kernel?
    Conditions: single-token step, int8/int4 codes or fp cache, no runtime
    attention fake-quant hooks (for the quantized cache, the cache IS the
    k/v quantization), MXU-aligned head_dim, and a TPU backend (or the
    interpret-mode override in tests)."""
    if _DECODE_KERNEL is False or s != 1:
        return False
    if any(sp is not None and sp.enabled for sp in (rq.q, rq.k, rq.v, rq.p)):
        return False
    kq = cache[0]  # [B, H, T, D] or stacked [L, B, H, T, D] (uint8 = int4)
    if kq.dtype not in (jnp.int8, jnp.uint8, jnp.bfloat16, jnp.float32):
        return False
    if _DECODE_KERNEL == "interpret":
        return True
    if kq.dtype not in (jnp.int8, jnp.uint8) and _DECODE_KERNEL != True:  # noqa: E712
        # fp-cache decode: XLA's einsum is faster at model level (measured
        # 166.7 vs 157.9 tok/s at T=4096 b4) — auto only routes the int8
        # cache, where codes-to-MXU beats dequant by +21..48%; True forces
        return False
    t_logical = kq.shape[-2] * (2 if kq.dtype == jnp.uint8 else 1)
    if kq.shape[-1] % 128 or t_logical % 512:
        return False
    return jax.default_backend() == "tpu"


#: layer-stacked decode-cache switch ("auto" = whenever the flash-decode
#: kernel serves every layer; False = always the per-layer xs/ys scan,
#: True behaves like "auto" — the stacked form is never forced where the
#: kernel cannot read it).
_STACKED = "auto"


def set_stacked_decode(mode) -> None:
    global _STACKED
    if mode not in (True, False, "auto"):
        raise ValueError(mode)
    _STACKED = mode


def _stacked_decode_ok(rq: RuntimeQuantConfig, cache: Dict[str, jax.Array], s: int) -> bool:
    """Route the decode step through the layer-stacked cache scan?

    The stacked form carries the [L, B, H, T, *] buffers through the layer
    scan and updates/reads them in place — but only the flash-decode
    kernels can read a stacked buffer without materializing a per-layer
    slice (their scalar-prefetched index maps select the layer in the
    BlockSpec), so this requires `_decode_kernel_ok` for the cache AND,
    under a decode mesh, that the shapes divide the mesh axes (the
    per-layer path can fall back to eager; the stacked path cannot)."""
    if _STACKED is False:
        return False
    arrs = tuple(cache[k] for k in sorted(cache.keys()))
    if not _decode_kernel_ok(rq, arrs, s):
        return False
    if _DECODE_MESH is not None:
        names = set(_DECODE_MESH.axis_names)
        if "dp" not in names and "tp" not in names:
            return False
        b, g = arrs[0].shape[1], arrs[0].shape[2]
        if b % _DECODE_MESH.shape.get("dp", 1) or g % _DECODE_MESH.shape.get("tp", 1):
            return False
    return True


def _kernel_mask(mask, b: int, t: int):
    """[s=1, T] / [B, 1, T] additive mask -> finite [B, T] for the kernel."""
    from ..ops.decode_attention import NEG

    if mask is None:
        return jnp.zeros((b, t), jnp.float32)
    m = mask[:, 0] if mask.ndim == 3 else jnp.broadcast_to(mask[-1:], (b, t))
    return jnp.maximum(m.astype(jnp.float32), NEG)


def _attn_block(
    p: Params,
    h: jax.Array,
    cfg: ModelConfig,
    rq: RuntimeQuantConfig,
    cos_sin: Optional[Tuple[jax.Array, jax.Array]],
    mask: Optional[jax.Array],
    kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    attn_impl=None,
    layer_idx=None,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    b, s, _ = h.shape
    hd = cfg.head_dim_
    if "qkv" in p:
        # horizontally fused projection (quant.serving.fuse_for_decode)
        nq, nkv = cfg.num_heads * hd, cfg.num_kv_heads * hd
        qkv = qlinear(h, p["qkv"]["w"], p["qkv"].get("b"), rq.act)
        q = qkv[..., :nq].reshape(b, s, cfg.num_heads, hd)
        k = qkv[..., nq : nq + nkv].reshape(b, s, cfg.num_kv_heads, hd)
        v = qkv[..., nq + nkv :].reshape(b, s, cfg.num_kv_heads, hd)
    else:
        q = qlinear(h, p["q"]["w"], p["q"].get("b"), rq.act).reshape(b, s, cfg.num_heads, hd)
        k = qlinear(h, p["k"]["w"], p["k"].get("b"), rq.act).reshape(b, s, cfg.num_kv_heads, hd)
        v = qlinear(h, p["v"]["w"], p["v"].get("b"), rq.act).reshape(b, s, cfg.num_kv_heads, hd)
    if cos_sin is not None:
        cos, sin = cos_sin
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    if layer_idx is not None and kv_cache is not None:
        # LAYER-STACKED cache carried through the decode layer-scan
        # ([L, B, H, T, *] buffers, updated in place at (layer, pos) and
        # read in place by the stacked flash-decode kernels' scalar-
        # prefetched index maps) — no per-layer cache slice is ever
        # materialized, vs the xs/ys streaming form's two full-cache
        # copies per step (round-1 b8 trace, ~0.41 ms each). Callers
        # guarantee `_stacked_decode_ok` held at trace time.
        if len(kv_cache) == 4:
            from ..ops.decode_attention import (
                flash_decode_gqa_s8_stacked,
                xla_decode_gqa_s8_stacked,
            )
            from ..ops.kvcache import cache_update_stacked

            new_cache = cache_update_stacked(kv_cache, layer_idx, k, v, cache_pos)
            t_len = new_cache[0].shape[3] * (
                2 if new_cache[0].dtype == jnp.uint8 else 1
            )
            if _use_xla_attn(new_cache[0].dtype) and _DECODE_MESH is None:
                fd = partial(xla_decode_gqa_s8_stacked, out_dtype=h.dtype)
            else:
                fd = partial(
                    flash_decode_gqa_s8_stacked,
                    out_dtype=h.dtype,
                    block_t=1024 if t_len % 1024 == 0 else 512,
                    interpret=_DECODE_KERNEL == "interpret",
                )
            quantized = True
        else:
            from ..ops.decode_attention import flash_decode_gqa_stacked

            ck, cv = kv_cache
            ck = _write_cache_stacked(ck, k.astype(ck.dtype), layer_idx, cache_pos)
            cv = _write_cache_stacked(cv, v.astype(cv.dtype), layer_idx, cache_pos)
            new_cache = (ck, cv)
            t_len = ck.shape[3]
            q = q.astype(ck.dtype)
            fd = partial(
                flash_decode_gqa_stacked,
                block_t=1024 if t_len % 1024 == 0 else 512,
                interpret=_DECODE_KERNEL == "interpret",
            )
            quantized = False
        if _DECODE_MESH is not None:
            fd = _sharded_decode(
                fd, b, new_cache[0].shape[2], quantized=quantized, stacked=True
            )
        if fd is None:  # pragma: no cover - guarded by _stacked_decode_ok
            raise RuntimeError(
                "stacked decode cache requires the flash-decode kernel; "
                "shapes do not divide the decode mesh"
            )
        attn = fd(q, *new_cache, _kernel_mask(mask, b, t_len), layer_idx).astype(
            h.dtype
        )
        out = qlinear(
            attn.reshape(b, s, cfg.num_heads * hd),
            p["o"]["w"], p["o"].get("b"), rq.act,
        )
        return out, new_cache
    if kv_cache is not None and len(kv_cache) == 4:
        # int8 quantized ring buffer (ops/kvcache.py), heads-major
        from ..ops.kvcache import cache_read, cache_update

        new_cache = cache_update(kv_cache, k, v, cache_pos)
        if attn_impl is None and _decode_kernel_ok(rq, new_cache, s):
            # quantized-cache decode: codes feed the MXU directly, never
            # elementwise-dequantized (the VPU trap that made the XLA
            # *dequant* formulation slower than bf16). int8 rides the
            # codes-direct XLA dots (_use_xla_attn); int4 the Pallas
            # kernel (free Mosaic nibble bitcast) — ops/decode_attention.py
            from ..ops.decode_attention import flash_decode_gqa_s8, xla_decode_gqa_s8

            t_len = new_cache[0].shape[2] * (
                2 if new_cache[0].dtype == jnp.uint8 else 1
            )
            if _use_xla_attn(new_cache[0].dtype) and _DECODE_MESH is None:
                fd = partial(xla_decode_gqa_s8, out_dtype=h.dtype)
            else:
                fd = partial(
                    flash_decode_gqa_s8,
                    out_dtype=h.dtype,
                    block_t=1024 if t_len % 1024 == 0 else 512,
                    interpret=_DECODE_KERNEL == "interpret",
                )
            if _DECODE_MESH is not None:
                fd = _sharded_decode(fd, b, new_cache[0].shape[1], quantized=True)
            if fd is not None:
                attn = fd(q, *new_cache, _kernel_mask(mask, b, t_len))
                out = qlinear(
                    attn.reshape(b, s, cfg.num_heads * hd),
                    p["o"]["w"], p["o"].get("b"), rq.act,
                )
                return out, new_cache
        k_all, v_all = cache_read(new_cache, h.dtype)
    elif kv_cache is not None:
        ck, cv = kv_cache
        ck = _write_cache(ck, k.astype(ck.dtype), cache_pos)
        cv = _write_cache(cv, v.astype(cv.dtype), cache_pos)
        new_cache = (ck, cv)
        if attn_impl is None and _decode_kernel_ok(rq, new_cache, s):
            # Pallas flash decode on the fp cache (ops/decode_attention.py)
            from ..ops.decode_attention import flash_decode_gqa

            t_len = ck.shape[2]
            fd = partial(
                flash_decode_gqa,
                block_t=1024 if t_len % 1024 == 0 else 512,
                interpret=_DECODE_KERNEL == "interpret",
            )
            if _DECODE_MESH is not None:
                fd = _sharded_decode(fd, b, ck.shape[1], quantized=False)
            if fd is not None:
                attn = fd(
                    q.astype(ck.dtype), ck, cv, _kernel_mask(mask, b, t_len)
                ).astype(h.dtype)
                out = qlinear(
                    attn.reshape(b, s, cfg.num_heads * hd),
                    p["o"]["w"], p["o"].get("b"), rq.act,
                )
                return out, new_cache
        k_all, v_all = ck.astype(h.dtype), cv.astype(h.dtype)
    else:
        k_all, v_all, new_cache = k, v, None
    # flash path only for the cache-free full-sequence forward (plain
    # causal mask); decode always uses the eager cache-masked path.
    # `attn_impl` swaps in an alternative core (e.g. ring attention) while
    # keeping the projection/RoPE/cache plumbing here.
    if attn_impl is not None:
        attn = attn_impl(q, k_all, v_all)
    else:
        attn = _attention(
            q, k_all, v_all, mask, cfg, rq,
            allow_flash=kv_cache is None,
            kv_heads_major=kv_cache is not None,  # cache layout [B, H, T, D]
        )
    out = qlinear(attn.reshape(b, s, cfg.num_heads * hd), p["o"]["w"], p["o"].get("b"), rq.act)
    return out, new_cache


def _moe_routing_weights(p: Params, h: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Dense [B, S, E] top-k renormalized routing weights (zero for
    unselected experts)."""
    router_logits = qlinear(h, p["router"]["w"]).astype(jnp.float32)  # [B,S,E]
    probs = jax.nn.softmax(router_logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)  # renormalize top-k
    onehot = jax.nn.one_hot(topi, cfg.num_experts, dtype=topv.dtype)  # [B,S,k,E]
    return jnp.einsum("bske,bsk->bse", onehot, topv)


#: MoE compute mode: None = dense exact top-k (every expert sees every
#: token, routing weights mask); a float enables GShard-style capacity
#: dispatch with that capacity factor. Read at trace time (same contract
#: as `set_flash`): changing it triggers a retrace.
_MOE_CAPACITY: "float | None" = None


def set_moe_capacity(factor) -> None:
    """Enable (factor, e.g. 1.25) or disable (None) capacity-dispatch MoE."""
    global _MOE_CAPACITY
    if factor is not None and factor <= 0:
        raise ValueError(f"capacity factor must be positive, got {factor}")
    _MOE_CAPACITY = factor


def _expert_ffn(e_params, x, rq: RuntimeQuantConfig):
    gate = qlinear(x, e_params["gate"]["w"], None, rq.act)
    up = qlinear(x, e_params["up"]["w"], None, rq.act)
    return qlinear(jax.nn.silu(gate) * up, e_params["down"]["w"], None, rq.act)


def _moe_capacity_block(
    p: Params, h: jax.Array, cfg: ModelConfig, rq: RuntimeQuantConfig, factor: float
) -> jax.Array:
    """GShard/Switch-style capacity-scheduled MoE (the reference has no MoE
    compute path at all — Mixtral there is only fake-quant of Linears,
    `quant/omniquant.py:198-206`; this is the TPU-native serving form).

    Each expert processes at most C = ceil(factor * k * T / E) tokens
    (rounded up to a multiple of 8 for TPU tiling); overflow tokens drop
    that expert's contribution. Dispatch/combine are one-hot einsums, so
    the whole block is three matmul-shaped ops that shard cleanly with the
    expert axis over the mesh (`parallel/sharding.py` expert_parallel):
    only [T, D] activations cross the all-to-all boundary instead of every
    expert's output for every token.
    """
    B, S, D = h.shape
    T = B * S
    E, k = cfg.num_experts, cfg.num_experts_per_tok
    C = min(T, -(-int(factor * k * T) // E))
    C = -(-C // 8) * 8  # sublane-align expert buffers
    x = h.reshape(T, D)

    router_logits = qlinear(x, p["router"]["w"]).astype(jnp.float32)  # [T,E]
    probs = jax.nn.softmax(router_logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, k)  # [T,k]
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)

    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # [T,k,E]
    # position of each (token, slot) within its expert queue. Slot-major
    # order (all slot-0 picks first) gives primary experts priority for
    # capacity, matching GShard's dispatch priority.
    oh = onehot.transpose(1, 0, 2).reshape(k * T, E)
    pos = jnp.cumsum(oh, axis=0) * oh - oh  # 0-based, only where assigned
    keep = (pos < C).astype(jnp.float32) * oh
    slot = jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)  # [kT,E,C]
    dispatch = (slot * keep[..., None]).reshape(k, T, E, C).transpose(1, 0, 2, 3)

    disp = jnp.sum(dispatch, axis=1)  # [T,E,C] (top-k picks are distinct experts)
    combine = jnp.einsum("tkec,tk->tec", dispatch, topv)

    xe = jnp.einsum("tec,td->ecd", disp.astype(x.dtype), x)  # [E,C,D]
    ye = jax.vmap(_expert_ffn, in_axes=(0, 0, None))(p["experts"], xe, rq)
    y = jnp.einsum("tec,ecd->td", combine, ye.astype(jnp.float32))
    return y.reshape(B, S, D).astype(h.dtype)


def _moe_block(p: Params, h: jax.Array, cfg: ModelConfig, rq: RuntimeQuantConfig) -> jax.Array:
    """Mixtral sparse-MoE MLP: softmax router, top-k expert mixture.

    The reference supports Mixtral via HF's module tree with its Linears
    fake-quantized and the router excluded (`quant/omniquant.py:198-206`);
    here experts are a stacked `[E, K, N]` axis vmapped per token-batch.
    Default compute is dense over experts with top-k routing weights
    masked in — exact routing semantics, jit-static shapes. With
    `set_moe_capacity(f)`, the capacity-dispatch path replaces it.
    """
    if _MOE_CAPACITY is not None:
        return _moe_capacity_block(p, h, cfg, rq, _MOE_CAPACITY)
    weights = _moe_routing_weights(p, h, cfg)

    outs = jax.vmap(_expert_ffn, in_axes=(0, None, None))(p["experts"], h, rq)  # [E,B,S,D]
    return jnp.einsum("ebsd,bse->bsd", outs.astype(jnp.float32), weights).astype(h.dtype)


def _mlp_block(p: Params, h: jax.Array, cfg: ModelConfig, rq: RuntimeQuantConfig) -> jax.Array:
    if cfg.is_moe:
        return _moe_block(p, h, cfg, rq)
    if cfg.arch == "llama":
        if "gateup" in p:
            gu = qlinear(h, p["gateup"]["w"], p["gateup"].get("b"), rq.act)
            gate, up = gu[..., : cfg.intermediate_size], gu[..., cfg.intermediate_size :]
        else:
            gate = qlinear(h, p["gate"]["w"], p["gate"].get("b"), rq.act)
            up = qlinear(h, p["up"]["w"], p["up"].get("b"), rq.act)
        return qlinear(jax.nn.silu(gate) * up, p["down"]["w"], p["down"].get("b"), rq.act)
    fc1 = qlinear(h, p["fc1"]["w"], p["fc1"].get("b"), rq.act)
    act = jax.nn.relu(fc1) if cfg.activation == "relu" else jax.nn.gelu(fc1)
    return qlinear(act, p["fc2"]["w"], p["fc2"].get("b"), rq.act)


def _norm(p_norm: Params, h: jax.Array, cfg: ModelConfig) -> jax.Array:
    if cfg.rms_norms:
        return rms_norm(h, p_norm["w"], cfg.rms_norm_eps, p_norm.get("b"))
    return layer_norm(h, p_norm["w"], p_norm["b"], 1e-5)


def decoder_layer(
    p: Params,
    h: jax.Array,
    cfg: ModelConfig,
    rq: RuntimeQuantConfig,
    cos_sin,
    mask,
    kv_cache=None,
    cache_pos=None,
    attn_impl=None,
    layer_idx=None,
):
    """Pre-norm residual layer (`int_llama_layer.py:213-267`,
    `int_opt_layer.py:230-347`), or Falcon's parallel attention+MLP off one
    shared layernorm (`int_falcon_layer.py:239-317`).

    `layer_idx` (traced scalar) marks `kv_cache` as the LAYER-STACKED
    buffers shared by all layers — see `_attn_block`."""
    if cfg.parallel_block:
        x = _norm(p["ln1"], h, cfg)
        attn_out, new_cache = _attn_block(
            p, x, cfg, rq, cos_sin, mask, kv_cache, cache_pos, attn_impl,
            layer_idx,
        )
        # Falcon-40B new-decoder: the parallel MLP reads its OWN norm
        # (ln_mlp); 7B shares the single input_layernorm
        mlp_x = _norm(p["ln2"], h, cfg) if "ln2" in p else x
        return h + attn_out + _mlp_block(p, mlp_x, cfg, rq), new_cache
    attn_in = _norm(p["ln1"], h, cfg)
    attn_out, new_cache = _attn_block(
        p, attn_in, cfg, rq, cos_sin, mask, kv_cache, cache_pos, attn_impl,
        layer_idx,
    )
    h = h + attn_out
    mlp_in = _norm(p["ln2"], h, cfg)
    h = h + _mlp_block(p, mlp_in, cfg, rq)
    return h, new_cache


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

OPT_POS_OFFSET = 2  # OPT's learned positions are offset by 2 (HF convention)


def embed(params: Params, tokens: jax.Array, cfg: ModelConfig, positions: jax.Array) -> jax.Array:
    """Token (+ learned position, OPT) embedding. Activations follow the
    *parameter* dtype (bf16 in production, fp32 in CPU tests) — `cfg.dtype`
    only controls initialization."""
    h = jnp.take(params["embed"], tokens, axis=0, mode="clip")
    if cfg.arch == "opt":
        if positions.shape[-1] > cfg.max_position_embeddings:
            raise ValueError(
                f"sequence length {positions.shape[-1]} exceeds "
                f"max_position_embeddings={cfg.max_position_embeddings}"
            )
        # mode="clip": jnp.take's default OOB mode is "fill" (NaN), which
        # would silently poison logits for dynamic decode positions
        h = h + jnp.take(params["pos_embed"], positions + OPT_POS_OFFSET, axis=0, mode="clip")
    return h


def final_norm(params: Params, h: jax.Array, cfg: ModelConfig) -> jax.Array:
    # rms_norms (llama AND mixtral — HF MixtralRMSNorm) vs layer_norm
    # (opt/falcon); routing by arch=="llama" here silently layer-normed
    # Mixtral's final hidden states, diverging from HF numerics.
    if cfg.rms_norms:
        return rms_norm(h, params["norm"]["w"], cfg.rms_norm_eps, params["norm"].get("b"))
    return layer_norm(h, params["norm"]["w"], params["norm"]["b"], 1e-5)


def lm_head(params: Params, h: jax.Array, cfg: ModelConfig) -> jax.Array:
    w = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    return qlinear(h, w)


def forward_hidden(
    params: Params,
    tokens: jax.Array,  # [B, S]
    cfg: ModelConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
) -> jax.Array:
    """Full-sequence causal forward to final hidden states (no lm_head) —
    the trunk the PPL loop drives (`main.py:127-136`)."""
    b, s = tokens.shape
    positions = jnp.arange(s)[None, :]
    h = embed(params, tokens, cfg, positions)
    cos_sin = (
        rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, h.dtype, cfg.rope_scaling_)
        if cfg.uses_rope
        else None
    )
    mask = causal_mask(s)

    def body(h, layer_p):
        h, _ = decoder_layer(layer_p, h, cfg, rq, cos_sin, mask)
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    return final_norm(params, h, cfg)


def forward_logits(
    params: Params,
    tokens: jax.Array,
    cfg: ModelConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
) -> jax.Array:
    return lm_head(params, forward_hidden(params, tokens, cfg, rq), cfg)


# ---------------------------------------------------------------------------
# KV-cache decode
# ---------------------------------------------------------------------------


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=None, quantized=False
) -> Dict[str, jax.Array]:
    """Preallocated heads-major KV cache [L, B, Hkv, T, D] (T after heads:
    the decode attention dot then reads the cache in place — seq-major
    forces a strided whole-cache transpose copy every step);
    `quantized=True` (or 8) -> int8 codes + per-token-head scales,
    `quantized=4` -> int4-packed codes (quarter the bf16 bytes) —
    ops/kvcache.py."""
    if quantized:
        from ..ops.kvcache import init_quantized_kv_cache

        bits = 4 if quantized == 4 else 8
        return init_quantized_kv_cache(cfg, batch, max_len, bits=bits)
    dtype = dtype or jnp.dtype(cfg.dtype)
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim_)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _ring_write_and_mask(pos, s, max_len: int, sink: int):
    """Write slot(s) and additive mask for the sink+ring cache layout.

    Slots [0, sink) pin the first `sink` absolute positions forever (the
    StreamingLLM "attention sink" — quality anchor for long sliding-window
    generation); slots [sink, max_len) form a ring of width W = max_len -
    sink holding the most recent positions. `pos` may be a scalar or a
    per-row vector [B] (multi-slot decode, s == 1).
    """
    w = max_len - sink
    if s == 1:
        write_slot = jnp.where(pos < max_len, pos, sink + (pos - sink) % w)
    else:
        write_slot = pos  # prefill chunks must fit without wrapping
    vec = getattr(pos, "ndim", 0) == 1
    last = (pos if s == 1 else pos + s - 1)
    last = last[:, None] if vec else last
    slots = jnp.arange(max_len)[None, :]
    qi = (pos[:, None] if vec else pos + jnp.arange(s)[:, None])
    abs_ring = last - ((last - slots) % w)
    ring_valid = (slots >= sink) & (abs_ring >= sink) & (abs_ring <= qi)
    sink_valid = (slots < sink) & (slots <= qi)
    mask = jnp.where(ring_valid | sink_valid, 0.0, -jnp.inf).astype(jnp.float32)
    if vec:
        mask = mask[:, None, :]  # [B, 1, T]
    return write_slot, mask


def _decode_layer_scan(
    params: Params,
    h: jax.Array,
    cache: Dict[str, jax.Array],
    write_slot,
    mask,
    cos_sin,
    cfg: ModelConfig,
    rq: RuntimeQuantConfig,
    stacked: bool,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Run the decoder layer stack against the KV cache.

    Two forms. Default (`stacked=False`): the cache buffers ride the scan
    as xs/ys — each layer sees its own [B, H, T, *] slice, any attention
    path works. Stacked (`stacked=True`, requires `_stacked_decode_ok`):
    the full [L, B, H, T, *] buffers travel in the CARRY and each layer
    updates only its token slot in place; the flash-decode kernels read
    the stacked buffer directly via their layer index_maps. The xs/ys form
    costs two whole-cache copies per step (slice-out + re-stack; ~0.41 ms
    each at b8 kv8 on v5e) that the carry form eliminates."""
    cache_keys = sorted(cache.keys())  # ("k","v") or ("k_q","k_s","v_q","v_s")
    if stacked:

        def sbody(carry, xs):
            layer_p, lidx = xs
            h, new_kv = decoder_layer(
                layer_p, carry[0], cfg, rq, cos_sin, mask, carry[1:],
                write_slot, layer_idx=lidx,
            )
            return (h, *new_kv), None

        carry, _ = jax.lax.scan(
            sbody,
            (h, *(cache[k] for k in cache_keys)),
            (params["layers"], jnp.arange(cfg.num_layers)),
        )
        return carry[0], dict(zip(cache_keys, carry[1:]))

    def body(h, xs):
        layer_p = xs[0]
        layer_cache = tuple(xs[1:])
        h, new_kv = decoder_layer(
            layer_p, h, cfg, rq, cos_sin, mask, layer_cache, write_slot
        )
        return h, new_kv

    h, new_cache = jax.lax.scan(
        body, h, (params["layers"], *(cache[k] for k in cache_keys))
    )
    return h, dict(zip(cache_keys, new_cache))


def decode_step(
    params: Params,
    cache: Dict[str, jax.Array],
    tokens: jax.Array,  # [B, S_step] (S_step=1 for decode, >1 for prefill)
    pos: jax.Array,  # scalar int32: write offset into the cache
    cfg: ModelConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
    sink_tokens: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One prefill/decode step against the preallocated KV cache.

    Single-token steps past the buffer wrap into sliding-window attention
    (ring slots), optionally pinning the first `sink_tokens` positions (the
    reference's concat cache can do neither). Returns (logits
    [B, S_step, V], updated cache)."""
    b, s = tokens.shape
    cache_keys = sorted(cache.keys())  # ("k","v") or ("k_q","k_s","v_q","v_s")
    c0 = cache[cache_keys[0]]
    # int4 code buffers pack two T-adjacent tokens per byte row
    max_len = c0.shape[3] * (2 if c0.dtype == jnp.uint8 else 1)
    positions = pos + jnp.arange(s)[None, :]
    h = embed(params, tokens, cfg, positions)
    cos_sin = (
        rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, h.dtype, cfg.rope_scaling_)
        if cfg.uses_rope
        else None
    )
    write_slot, mask = _ring_write_and_mask(pos, s, max_len, sink_tokens)
    h, new_cache = _decode_layer_scan(
        params, h, cache, write_slot, mask, cos_sin, cfg, rq,
        stacked=_stacked_decode_ok(rq, cache, s),
    )
    h = final_norm(params, h, cfg)
    logits = lm_head(params, h, cfg)
    return logits, new_cache


def decode_step_multi(
    params: Params,
    cache: Dict[str, jax.Array],
    tokens: jax.Array,  # [B, 1] one token per slot
    pos: jax.Array,  # [B] per-slot absolute positions
    cfg: ModelConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
    sink_tokens: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One decode step for a BATCH OF INDEPENDENT SEQUENCES at different
    positions — the kernel of continuous batching (`serving/engine.py`).
    Each slot writes into its own sink+ring window."""
    b, s = tokens.shape
    assert s == 1, "multi-slot decode is single-token"
    cache_keys = sorted(cache.keys())
    c0 = cache[cache_keys[0]]
    max_len = c0.shape[3] * (2 if c0.dtype == jnp.uint8 else 1)
    positions = pos[:, None]  # [B, 1]
    h = embed(params, tokens, cfg, positions)
    cos_sin = (
        rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, h.dtype, cfg.rope_scaling_)
        if cfg.uses_rope
        else None
    )
    write_slot, mask = _ring_write_and_mask(pos, 1, max_len, sink_tokens)
    # multi-slot (vector-pos) stacked writes stay OFF under "auto": the
    # row-indexed scatter is not aliased into the scan carry (full-cache
    # copy per step, 129 tok/s at the serve bench) and the per-row DUS
    # chain that replaced it still measured 218 vs the xs/ys form's 364
    # (8 rows x 4 buffers x 32 layers of ~us-scale writes per step).
    # `set_stacked_decode(True)` forces it (bit-exact, tested).
    h, new_cache = _decode_layer_scan(
        params, h, cache, write_slot, mask, cos_sin, cfg, rq,
        stacked=_STACKED is True and _stacked_decode_ok(rq, cache, 1),
    )
    h = final_norm(params, h, cfg)
    logits = lm_head(params, h, cfg)
    return logits, new_cache


def greedy_generate(
    params: Params,
    cache: Dict[str, jax.Array],
    first_token: jax.Array,  # [B, 1] (e.g. last prefill argmax)
    pos0: jax.Array,  # scalar: cache position of first_token
    n_steps: int,
    cfg: ModelConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
    sink_tokens: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """On-device greedy decode loop: `n_steps` tokens in ONE dispatch via
    `lax.scan` (the reference's per-token python loop,
    `llama.py:409-464`, pays a host round-trip per token — on a remote
    TPU that dominates; this is the serving-shaped decode).

    Returns (tokens [B, n_steps], final cache)."""
    from ..ops.matmul import prepare_decode_params
    from .windowed import decode_window, windowed_ok

    int4_cache = any(
        getattr(v, "dtype", None) == jnp.uint8 for v in cache.values()
    )
    # n_steps must fit the ring: a window of >= t_logical steps would wrap
    # onto itself in the merge (the oldest wrap would survive — advisor
    # round-3 medium finding); fall back to per-step decode there
    t_logical = cache["k_s"].shape[-2] if "k_s" in cache else 0

    def per_step(cache):
        p2 = prepare_decode_params(params)  # s4: hoist int4 prep off the scan

        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = decode_step(p2, cache, tok, pos, cfg, rq, sink_tokens)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            return (nxt, pos + 1, cache), nxt[:, 0]

        (_, _, cache), toks = jax.lax.scan(
            body, (first_token.astype(jnp.int32), jnp.int32(pos0), cache), None,
            length=n_steps,
        )
        return toks.T, cache

    if (
        int4_cache
        and n_steps < t_logical - sink_tokens  # decode_window's ring-width
        #                                        requirement (merge self-alias)
        and windowed_ok(cfg, cache, rq, sink_tokens)
    ):
        # window write-combined decode: the main cache is a loop
        # invariant (zero per-step cache-update traffic). Routed for the
        # int4 cache only: its nibble RMW inside the scan breaks XLA's
        # in-place aliasing (full-buffer copy per layer, 76 tok/s), while
        # windowed measures 136.6. For the int8 cache the plain stacked
        # path's pure-DUS writes are cheap (2.2 us/layer) and measure
        # faster than the window overheads (141.5 vs 135.7 at b1) — the
        # multi-slot serving engine routes windowed itself (374 vs 344).
        #
        # EXACTNESS GATE (round 5, VERDICT r4 item 9): the window path is
        # bit-exact only while nothing is evicted during the dispatch
        # (pos0 + n_steps <= ring length). Past that, its frozen
        # main-cache mask lets a query see up to n_steps already-evicted
        # tokens — measured 1/8 post-wrap token agreement vs per-step on
        # a tiny ring (tests/test_windowed.py) — so the auto-route picks
        # per-step decode at runtime once the dispatch would cross the
        # ring boundary (positions are traced; lax.cond compiles both
        # branches). The serving engine applies the same gate on the
        # host (`ServingEngine._dispatch_window` fits_ring).
        def windowed(cache):
            return decode_window(
                params, cache, first_token, pos0, n_steps, cfg, rq,
                sink_tokens=sink_tokens,
            )

        return jax.lax.cond(
            jnp.asarray(pos0) + n_steps <= t_logical, windowed, per_step, cache
        )

    return per_step(cache)


def speculative_generate(
    params: Params,
    draft_params: Params,
    cache: Dict[str, jax.Array],
    draft_cache: Dict[str, jax.Array],
    first_token: jax.Array,  # [1, 1]
    pos0: jax.Array,
    n_rounds: int,
    k: int,
    cfg: ModelConfig,
    draft_cfg: Optional[ModelConfig] = None,
    rq: RuntimeQuantConfig = NO_QUANT,
    draft_rq: RuntimeQuantConfig = NO_QUANT,
    sink_tokens: int = 0,
):
    """Greedy speculative decoding (beyond the reference, which decodes one
    token per forward): each round the draft model proposes `k` greedy
    tokens, the target verifies all k+1 positions in ONE forward, and the
    longest matching prefix plus the target's correction token are
    emitted. With greedy acceptance the emitted stream is EXACTLY the
    target model's greedy sequence — the draft only changes speed.

    Rejected positions leave stale KV entries, but every next round's
    (k+1)-token write covers them before any attention reads them
    (write-then-attend inside `decoder_layer`), so no rollback pass is
    needed. Restricted to batch 1: acceptance counts diverge per row.

    Returns (tokens [n_rounds, k+1] right-padded, counts [n_rounds],
    cache, draft_cache, final_pos); flatten with `flatten_speculative`.
    """
    if first_token.shape[0] != 1:
        raise ValueError("speculative_generate supports batch=1")
    dcfg = draft_cfg or cfg
    from ..ops.matmul import prepare_decode_params

    params = prepare_decode_params(params)
    draft_params = prepare_decode_params(draft_params)

    def round_body(carry, _):
        tok, pos, cache, dcache = carry

        def dbody(c, _):
            t, p, dc = c
            lg, dc = decode_step(draft_params, dc, t, p, dcfg, draft_rq, sink_tokens)
            nt = jnp.argmax(lg[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            return (nt, p + 1, dc), nt[:, 0]

        (_, _, dcache), drafts = jax.lax.scan(
            dbody, (tok, pos, dcache), None, length=k
        )  # drafts [k, 1]
        seq = jnp.concatenate([tok, drafts.T], axis=1)  # [1, k+1]
        logits, cache = decode_step(params, cache, seq, pos, cfg, rq, sink_tokens)
        t_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [1, k+1]
        d_row = seq[:, 1:]  # [1, k]
        match = (d_row == t_pred[:, :k]).astype(jnp.int32)
        m = jnp.sum(jnp.cumprod(match, axis=1), axis=1)[0]  # accepted drafts
        idx = jnp.arange(k + 1)
        emitted = jnp.where(idx < m, jnp.pad(d_row[0], (0, 1)), t_pred[0])
        new_tok = emitted[m][None, None]
        return (new_tok, pos + m + 1, cache, dcache), (emitted, m + 1)

    (_, pos, cache, dcache), (toks, counts) = jax.lax.scan(
        round_body,
        (first_token.astype(jnp.int32), jnp.int32(pos0), cache, draft_cache),
        None,
        length=n_rounds,
    )
    return toks, counts, cache, dcache, pos


def flatten_speculative(toks, counts, limit: Optional[int] = None):
    """Host-side: concatenate each round's first `count` tokens."""
    import numpy as np

    out = []
    for row, c in zip(np.asarray(toks), np.asarray(counts)):
        out.extend(row[: int(c)].tolist())
    return out[:limit] if limit else out


def sample_logits(
    logits: jax.Array,  # [B, V]
    key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """One sampling step: temperature -> top-k mask -> nucleus (top-p)
    mask -> categorical draw. All masks are jit-static-shaped (top_k and
    top_p restrict via -inf fills, not gathers). temperature<=0 means
    greedy (serving frameworks' convention; the reference only ever
    decodes greedily, `models/LMClass.py:115-118`)."""
    if temperature is None or temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_p < 1.0:
        sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p (always
        # keep the argmax: cum shifted so the first element survives)
        keep_sorted = cum - probs < top_p
        # threshold = smallest logit still kept
        thresh = jnp.min(jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1)[:, None]
        scaled = jnp.where(scaled < thresh, -jnp.inf, scaled)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


def sample_generate(
    params: Params,
    cache: Dict[str, jax.Array],
    first_token: jax.Array,  # [B, 1]
    pos0: jax.Array,
    n_steps: int,
    cfg: ModelConfig,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    rq: RuntimeQuantConfig = NO_QUANT,
    sink_tokens: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sampled decode loop (temperature / top-k / nucleus), one dispatch
    via `lax.scan` like `greedy_generate`. PRNG key is split per step so
    results are reproducible for a given key."""
    from ..ops.matmul import prepare_decode_params

    params = prepare_decode_params(params)

    def body(carry, _):
        tok, pos, cache, k = carry
        k, sub = jax.random.split(k)
        logits, cache = decode_step(params, cache, tok, pos, cfg, rq, sink_tokens)
        nxt = sample_logits(
            logits[:, -1, :], sub, temperature=temperature, top_k=top_k, top_p=top_p
        )[:, None]
        return (nxt, pos + 1, cache, k), nxt[:, 0]

    (_, _, cache, _), toks = jax.lax.scan(
        body,
        (first_token.astype(jnp.int32), jnp.int32(pos0), cache, key),
        None,
        length=n_steps,
    )
    return toks.T, cache
