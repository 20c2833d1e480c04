"""Serving recode: grouped low-bit weights -> per-column symmetric int8.

Measured on v5e: one full-K `s8 @ s8` dot runs at HBM speed-of-light, but
any per-group formulation (batched dots or VPU dequant) is 3-6x slower. So
for serving, weights quantized with ANY algorithm/grouping are re-coded
into per-output-column symmetric int8:

    c8[:, n] = round(W_deq[:, n] / s_n),   s_n = absmax_n / 127

The recode adds at most an int8-per-column rounding on top of the original
quantization error (step ~s_n, far below a W4 g128 step), so task scores
are preserved while decode hits the native s8 MXU path with a single
post-matmul column scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.params import MOE_EXPERT_LINEARS, linear_names
from .qtensor import QuantizedTensor, dequantize


def _percol_s8(wf: jnp.ndarray):
    """fp32 [K, N] -> (int8 codes, [1, N] fp32 scale), symmetric."""
    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    s = jnp.clip(absmax / 127.0, 1e-12, None)
    c8 = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return c8, s


def recode_s8_percol(qt: QuantizedTensor) -> QuantizedTensor:
    """Any QuantizedTensor -> per-column symmetric int8 container."""
    c8, s = _percol_s8(dequantize(qt, jnp.float32))
    return QuantizedTensor(
        data=c8,
        scale=s,  # [1, N]
        zero=None,
        bits=8,
        group_size=None,
        sym=True,
        k=qt.k,
        n=qt.n,
        packed=False,
        out_dtype=qt.out_dtype,
    )


def recode_head_s8(w):
    """Full-precision lm_head [d, vocab] -> per-column symmetric s8. The
    head is ~12% of decode bytes at 8B (1.05 GB bf16); s8 halves it and
    rides the same native dot path as the recoded linears."""
    c8, sc = _percol_s8(w.astype(jnp.float32))
    out_dtype = w.dtype if jnp.issubdtype(w.dtype, jnp.floating) else jnp.bfloat16
    return QuantizedTensor(
        data=c8, scale=sc, zero=None, bits=8, group_size=None, sym=True,
        k=w.shape[0], n=w.shape[1], packed=False, out_dtype=out_dtype,
    )


def recode_head_s4(w):
    """Full-precision lm_head [d, vocab] -> per-column symmetric int4 codes
    (the s4 backend's head: true 4-bit HBM bytes after the in-jit
    `prepare_s4` conversion, quartering the bf16 head's ~12% decode-byte
    share at 8B). Coarser than the s8 recode (~1.7% RMS of column absmax vs
    ~0.23%) — an opt-in throughput format, like the reference's most
    aggressive weight settings."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    s = jnp.clip(absmax / 7.0, 1e-12, None)
    c4 = jnp.clip(jnp.round(wf / s), -7, 7).astype(jnp.int8)
    out_dtype = w.dtype if jnp.issubdtype(w.dtype, jnp.floating) else jnp.bfloat16
    return QuantizedTensor(
        data=c4, scale=s, zero=None, bits=4, group_size=None, sym=True,
        k=w.shape[0], n=w.shape[1], packed=False, out_dtype=out_dtype,
    )


def _concat_qt(qts):
    """Concat containers along N (stacked `[L, K, N]` layout): per-column
    s8 and grouped/packed tensors both concat exactly — groups run along K,
    so scales/zeros `[.., G, N]` and (packed) data `[.., K/f, N]` join on
    the last axis."""
    base = qts[0]
    zero = (
        None
        if base.zero is None
        else jnp.concatenate([q.zero for q in qts], axis=-1)
    )
    return QuantizedTensor(
        data=jnp.concatenate([q.data for q in qts], axis=-1),
        scale=jnp.concatenate([q.scale for q in qts], axis=-1),
        zero=zero,
        bits=base.bits,
        group_size=base.group_size,
        sym=base.sym,
        k=base.k,
        n=sum(q.n for q in qts),
        packed=base.packed,
        out_dtype=base.out_dtype,
    )


def _fusible(ws) -> bool:
    if all(isinstance(w, jnp.ndarray) for w in ws):
        return True
    if not all(isinstance(w, QuantizedTensor) for w in ws):
        return False
    if any(w.g_idx is not None for w in ws):  # act-order groups don't concat
        return False
    if len({
        (w.bits, w.k, w.group_size, w.packed, w.sym, w.zero is None, str(w.out_dtype))
        for w in ws
    }) != 1:
        return False
    # per-column s8 serving containers, or grouped (incl. packed) tensors —
    # both concat exactly along N
    return ws[0].group_size is not None or (not ws[0].packed and ws[0].zero is None)


def _fuse_group(layers, names, fused_name):
    """Merge `names` entries into one horizontally-concatenated linear."""
    entries = [layers[n] for n in names]
    ws = [e["w"] for e in entries]
    if not _fusible(ws):
        return False
    biases = [e.get("b") for e in entries]
    if any(b is not None for b in biases) and not all(b is not None for b in biases):
        return False
    fused = {
        "w": _concat_qt(ws)
        if isinstance(ws[0], QuantizedTensor)
        else jnp.concatenate(ws, axis=-1)
    }
    if biases[0] is not None:
        fused["b"] = jnp.concatenate(biases, axis=-1)
    for n in names:
        del layers[n]
    layers[fused_name] = fused
    return True


def fuse_for_decode(params, cfg):
    """Horizontally fuse q/k/v -> qkv and gate/up -> gateup for decode.

    Single-chip decode dispatches ~7 weight dots per layer; each carries a
    fixed kernel cost that at s=1 is a visible slice of the 8 GB/token
    budget. Fusing the three QKV projections and the two SwiGLU inputs cuts
    that to 5 dots AND drops two redundant per-token activation
    quantizations (`a8_matmul` re-quantizes its input per call). Numerics
    are unchanged: per-output-column scales concatenate exactly.

    Fuses zero-free per-column containers (the s8 serving recode), grouped
    tensors with matching (bits, K, group_size, packed) — the s4 backend's
    packed W4 storage, whose [G, N] scales/zeros concat exactly — or raw fp
    arrays. NOT for tensor-parallel execution — TP shards attention by
    heads, which the concatenated [q|k|v] column layout does not respect.
    """
    out = dict(params)
    layers = dict(params["layers"])
    if all(n in layers for n in ("q", "k", "v")):
        _fuse_group(layers, ("q", "k", "v"), "qkv")
    if all(n in layers for n in ("gate", "up")):
        _fuse_group(layers, ("gate", "up"), "gateup")
    out["layers"] = layers
    return out


def recode_model_s8(params, cfg, include_head: bool = False):
    """Recode every quantized decoder linear for s8 serving.

    Layers are processed one at a time (a vmap over the layer axis would
    materialize the fp dequant of the whole model at once — 28 GB for 8B).
    `include_head` additionally recodes a non-tied lm_head (beyond the
    reference, which keeps the head fp16)."""
    jit_recode = jax.jit(recode_s8_percol)

    out = dict(params)
    layers = dict(params["layers"])
    def recode_stacked(w, lead_dims: int):
        """Recode a QuantizedTensor with `lead_dims` stacked leading axes
        ([L, ...] linears, [L, E, ...] experts), one slice at a time."""
        if lead_dims == 0:
            return jit_recode(w)
        per = [
            recode_stacked(jax.tree_util.tree_map(lambda a: a[i], w), lead_dims - 1)
            for i in range(w.data.shape[0])
        ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per)

    for name in linear_names(cfg):
        entry = dict(layers[name])
        w = entry["w"]
        if isinstance(w, QuantizedTensor):
            entry["w"] = recode_stacked(w, 1)
            layers[name] = entry
    if cfg.is_moe:
        # experts [L, E, K, N] carry most MoE bytes — recode them too
        experts = dict(layers["experts"])
        for name in MOE_EXPERT_LINEARS:
            entry = dict(experts[name])
            if isinstance(entry["w"], QuantizedTensor):
                entry["w"] = recode_stacked(entry["w"], 2)
                experts[name] = entry
        layers["experts"] = experts
    out["layers"] = layers
    if include_head and "lm_head" in out:
        out["lm_head"] = jax.jit(recode_head_s8)(out["lm_head"])
    return out
