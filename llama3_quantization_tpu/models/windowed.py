"""Window write-combined decode: K steps per dispatch, zero per-step
cache traffic beyond the reads attention itself needs.

Why this exists (measured on v5e, round 3): every formulation that
updates the multi-hundred-MB KV cache *inside* the decode scan pays for
it —

- xs/ys layer-scan streaming: two whole-cache copies per step
  (~0.41 ms each at b8 kv8);
- stacked carry + row-indexed scatter: not aliased, full copy per step
  (129 tok/s serve bench);
- stacked carry + per-row DUS chain: aliased but 1024 tiny writes/step
  (218 tok/s);
- stacked carry + int4 nibble read-modify-write: the *read* of the carry
  breaks in-place aliasing — a full-buffer copy per layer per step
  (106 us/layer, kv4 b1 decode collapsed 141 -> 76 tok/s).

The windowed form makes the main cache a LOOP INVARIANT (closure
capture — never copied): each step writes its K/V only into a small
per-window side buffer ([L, B, H, KW, *], riding the layer scan as
xs/ys — cheap because it is small), and attention is the online-softmax
MERGE of (a) the stacked flash-decode kernel over the main cache
(`return_stats=True`) and (b) exact attention over the window segment.
After the window, ONE bounded-scratch merge writes the window into the
ring cache (round 5, `_ring_piece_merge`: 2-3 static-width
dynamic-slice/update slices per batch row covering the window's
circular span — O(window) traffic, no full-cache gather scratch;
wrap-safe, per-row positions supported; for the int4 cache the merge
composes nibbles at the byte-row level. The round-3 whole-token-axis
gather+where form remains as the odd-sink packed fallback and the
L3Q_WINDOW_MERGE=gather A/B knob).

This is the TPU-native analogue of the write-combining KV designs in
production serving stacks; the reference has nothing comparable (its
cache is an eager torch.cat, `/root/reference/models/int_llama_layer.py:
130-135`).

Scope: quantized stacked caches (int8 / int4), single-token steps
(sink tokens supported since round 4 — the merge maps absolute positions
onto the sink+ring layout). Callers fall back to `decode_step`/`decode_step_multi`
otherwise (`windowed_ok`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.kvcache import kv4_codes, kv4_pack, kv4_unpack_codes, kv_quantize
from ..ops.matmul import prepare_decode_params, qlinear
from .configs import ModelConfig
from .transformer import (
    NO_QUANT,
    RuntimeQuantConfig,
    _decode_kernel_ok,
    _kernel_mask,
    _mlp_block,
    _norm,
    _ring_write_and_mask,
    apply_rope,
    embed,
    final_norm,
    lm_head,
    rope_cos_sin,
)


#: window write-combining switch ("auto" = whenever applicable; False =
#: always the per-step decode paths — for A/B tests of the underlying
#: stacked/xs-ys forms)
_WINDOWED = "auto"


def set_windowed_decode(mode) -> None:
    global _WINDOWED
    if mode not in (True, False, "auto"):
        raise ValueError(mode)
    _WINDOWED = mode


def windowed_ok(cfg: ModelConfig, cache: Dict[str, jax.Array],
                rq: RuntimeQuantConfig, sink_tokens: int) -> bool:
    """Is the window write-combined decode applicable?

    Semantics caveat (advisor round-3): the main-cache visibility mask is
    frozen at the window start, so once positions exceed the ring length
    (`pos + n_steps > max_len`) eviction advances at WINDOW granularity —
    a query can see up to `n_steps` already-evicted tokens alongside
    their in-window replacements, a numeric divergence from
    `decode_step`'s per-step ring (measured 1/8 post-wrap token
    agreement on a tiny ring — tests/test_windowed.py). Positions are
    traced here, so the gate lives in the callers: the serving engine
    falls back to the per-step scan on the host when any active slot
    would cross the ring boundary inside the window
    (`ServingEngine._dispatch_window` fits_ring), and
    `greedy_generate`'s auto-route guards with an in-jit `lax.cond` on
    `pos0 + n_steps <= ring length` (round 5 — direct `decode_window`
    callers past that boundary own the approximation).
    `decode_window` separately rejects n_steps >= ring length (the merge
    would self-alias)."""
    if _WINDOWED is False:
        return False
    if cfg.is_moe or cfg.parallel_block:
        return False
    if sorted(cache.keys()) != ["k_q", "k_s", "v_q", "v_s"]:
        return False
    from . import transformer as _t

    if _t._DECODE_MESH is not None:
        # round 4 lifts the v1 single-replica gate for the int8 cache:
        # the codes-direct XLA attention is plain GSPMD (no shard_map
        # needed — batch shards on dp, KV head groups on tp by
        # propagation). The int4 cache still needs the Pallas kernel's
        # scalar-prefetch BlockSpecs, which the windowed merge does not
        # shard_map — single-replica only there.
        if not _t._use_xla_attn(cache["k_q"].dtype):
            return False
    arrs = tuple(cache[k] for k in sorted(cache.keys()))
    return _decode_kernel_ok(rq, arrs, 1)


def _merge_attn(o1, m1, l1, o2, m2, l2):
    """Online-softmax merge of two normalized attention segments.

    o*: [B, G, rep, D] f32; m*/l*: [B, G, rep] f32. A segment with l == 0
    (nothing visible) drops out exactly."""
    m_star = jnp.maximum(m1, m2)
    w1 = l1 * jnp.exp(m1 - m_star)
    w2 = l2 * jnp.exp(m2 - m_star)
    denom = jnp.maximum(w1 + w2, 1e-30)
    return (o1 * w1[..., None] + o2 * w2[..., None]) / denom[..., None]


def _window_attn(q, wk, wks, wv, wvs, wmask):
    """Exact attention over the window segment.

    q [B, G, rep, D] f32; wk/wv [B, H, KW, D] int8 codes; wks/wvs
    [B, H, KW, 1] f32; wmask [B, 1, 1, KW] additive. Returns normalized
    (o, m, l) for `_merge_attn`."""
    d = q.shape[-1]
    kf = wk.astype(jnp.float32) * wks  # [B, H, KW, D]
    s = jnp.einsum("bgrd,bgjd->bgrj", q, kf) / math.sqrt(d) + wmask
    m = jnp.max(s, axis=-1)  # [B, G, rep]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    vf = wv.astype(jnp.float32) * wvs
    o = jnp.einsum("bgrj,bgjd->bgrd", p, vf) / jnp.maximum(l, 1e-30)[..., None]
    return o, m, l


def _attn_block_windowed(
    p, x, cfg, rq, cos_sin, main_mask, cache, w_slices, widx, layer_idx,
    block_t, interpret,
):
    """Attention = kernel(main cache, loop-invariant) MERGE exact(window).

    `w_slices` = (wk, wks, wv, wvs) for THIS layer ([B, H, KW, *] — the
    layer scan streams them as xs/ys); `widx` = this step's window slot.
    Returns (attn_out [B, 1, Hq*D], updated w_slices)."""
    from ..ops.decode_attention import (
        flash_decode_gqa_s8_stacked,
        xla_decode_gqa_s8_stacked,
    )
    from .transformer import _use_xla_attn

    b, s, _ = x.shape
    hd = cfg.head_dim_
    if "qkv" in p:
        nq, nkv = cfg.num_heads * hd, cfg.num_kv_heads * hd
        qkv = qlinear(x, p["qkv"]["w"], p["qkv"].get("b"), rq.act)
        q = qkv[..., :nq].reshape(b, s, cfg.num_heads, hd)
        k = qkv[..., nq : nq + nkv].reshape(b, s, cfg.num_kv_heads, hd)
        v = qkv[..., nq + nkv :].reshape(b, s, cfg.num_kv_heads, hd)
    else:
        q = qlinear(x, p["q"]["w"], p["q"].get("b"), rq.act).reshape(b, s, cfg.num_heads, hd)
        k = qlinear(x, p["k"]["w"], p["k"].get("b"), rq.act).reshape(b, s, cfg.num_kv_heads, hd)
        v = qlinear(x, p["v"]["w"], p["v"].get("b"), rq.act).reshape(b, s, cfg.num_kv_heads, hd)
    if cos_sin is not None:
        cos, sin = cos_sin
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    wk, wks, wv, wvs = w_slices
    int4 = cache["k_q"].dtype == jnp.uint8
    quantize = kv4_codes if int4 else kv_quantize
    nk, nks = quantize(jnp.swapaxes(k, 1, 2))  # [B, H, 1, D] codes
    nv, nvs = quantize(jnp.swapaxes(v, 1, 2))
    wk = jax.lax.dynamic_update_slice(wk, nk, (0, 0, widx, 0))
    wks = jax.lax.dynamic_update_slice(wks, nks, (0, 0, widx, 0))
    wv = jax.lax.dynamic_update_slice(wv, nv, (0, 0, widx, 0))
    wvs = jax.lax.dynamic_update_slice(wvs, nvs, (0, 0, widx, 0))

    g = cfg.num_kv_heads
    rep = cfg.num_heads // g
    qg = q.reshape(b, g, rep, hd)

    if _use_xla_attn(cache["k_q"].dtype):
        o1, m1, l1 = xla_decode_gqa_s8_stacked(
            q, cache["k_q"], cache["k_s"], cache["v_q"], cache["v_s"],
            main_mask, layer_idx, out_dtype=jnp.float32, return_stats=True,
        )
    else:
        o1, m1, l1 = flash_decode_gqa_s8_stacked(
            q, cache["k_q"], cache["k_s"], cache["v_q"], cache["v_s"],
            main_mask, layer_idx, out_dtype=jnp.float32, block_t=block_t,
            interpret=interpret, return_stats=True,
        )
    o1 = o1.reshape(b, g, rep, hd).astype(jnp.float32)

    kw = wk.shape[2]
    wmask = jnp.where(
        jnp.arange(kw)[None, None, None, :] <= widx, 0.0, -jnp.inf
    ).astype(jnp.float32)
    o2, m2, l2 = _window_attn(qg.astype(jnp.float32), wk, wks, wv, wvs, wmask)

    attn = _merge_attn(o1, m1, l1, o2, m2, l2)
    attn = attn.reshape(b, s, cfg.num_heads * hd).astype(x.dtype)
    out = qlinear(attn, p["o"]["w"], p["o"].get("b"), rq.act)
    return out, (wk, wks, wv, wvs)


def _decode_step_windowed(
    params, cache, w_bufs, tokens, pos, widx, main_mask, cfg, rq,
    block_t, interpret,
):
    """One windowed decode step: h through the layer stack; the main cache
    is closure-captured (never written), the window buffers ride the layer
    scan as xs/ys."""
    b, s = tokens.shape
    positions = pos[:, None] if getattr(pos, "ndim", 0) == 1 else (
        pos + jnp.arange(s)[None, :]
    )
    h = embed(params, tokens, cfg, positions)
    cos_sin = (
        rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, h.dtype, cfg.rope_scaling_)
        if cfg.uses_rope
        else None
    )

    def body(hc, xs):
        layer_p, wk, wks, wv, wvs, lidx = xs
        x = _norm(layer_p["ln1"], hc, cfg)
        attn_out, new_w = _attn_block_windowed(
            layer_p, x, cfg, rq, cos_sin, main_mask, cache,
            (wk, wks, wv, wvs), widx, lidx, block_t, interpret,
        )
        hc = hc + attn_out
        mlp_in = _norm(layer_p["ln2"], hc, cfg)
        hc = hc + _mlp_block(layer_p, mlp_in, cfg, rq)
        return hc, new_w

    h, new_w = jax.lax.scan(
        body, h, (params["layers"], *w_bufs, jnp.arange(cfg.num_layers))
    )
    h = final_norm(params, h, cfg)
    return lm_head(params, h, cfg), new_w


def _ring_gather_merge(buf, win, pos0, t_logical, packed, sink: int = 0):
    """Write `win` ([L, B, H, KW, *]) into the sink+ring buffer `buf` at
    ABSOLUTE positions pos0_b + j — as ONE vectorized gather + where over
    the token axis (no scatter, no RMW-in-scan; wrap-safe).

    Slot occupancy follows `_ring_write_and_mask`: slots [0, sink) pin
    absolute positions 0..sink-1 forever; ring slot t >= sink holds the
    LARGEST position p <= last with p == t (mod w), w = T - sink (for
    sink == 0 this reduces to the plain ring j = (slot - pos0) mod T —
    proven equivalent). `packed=True`: buf rows are T-pair-packed int4
    bytes (`kv4_pack`) and `win` holds signed codes — nibbles compose at
    the byte-row level."""
    kw = win.shape[3]
    if getattr(pos0, "ndim", 0) == 0:
        pos0 = pos0[None]
    p0 = pos0[None, :, None, None]  # over [L, B, H, T']
    w = t_logical - sink
    last = p0 + kw - 1

    def gather_tok(tok_idx):
        """For each cache slot, the window index that lands there and
        whether this window touches it. Returns 5D (indices broadcast
        over [L, ., H, ., last])."""
        ring_abs = last - jnp.mod(last - tok_idx, w)
        abs_ = jnp.where(tok_idx < sink, tok_idx, ring_abs)  # [1, B, 1, T']
        j = abs_ - p0
        # a ring slot only holds positions >= sink (positions below sink
        # live in the pinned sink slots, never in the ring)
        valid = (tok_idx < sink) | (abs_ >= sink)
        take = ((j >= 0) & (j < kw) & valid)[..., None]  # [1, B, 1, T', 1]
        jc = jnp.clip(j, 0, kw - 1)[..., None]
        g = jnp.take_along_axis(win, jc, axis=3)
        return g, take

    if not packed:
        tok = jnp.arange(buf.shape[3])[None, None, None, :]
        g, take = gather_tok(tok)
        return jnp.where(take, g, buf)
    # int4: byte row r holds logical tokens (2r, 2r+1)
    rows = jnp.arange(buf.shape[3])[None, None, None, :]
    g_lo, take_lo = gather_tok(2 * rows)
    g_hi, take_hi = gather_tok(2 * rows + 1)
    old_lo = buf & 0xF
    old_hi = buf >> 4
    nib_lo = jnp.where(take_lo, g_lo.astype(jnp.uint8) & 0xF, old_lo)
    nib_hi = jnp.where(take_hi, g_hi.astype(jnp.uint8) & 0xF, old_hi)
    return (nib_lo | (nib_hi << 4)).astype(jnp.uint8)


def _piece_merge_row(buf, win, row, pos0_b, t_logical, packed, sink, kw):
    """Merge one batch row's window into the shared cache buffer with
    BOUNDED scratch: the circular ring span the window touches is covered
    by two static-width slices (plus a pinned-sink slice when
    `sink > 0`), each a `dynamic_slice -> masked merge ->
    dynamic_update_slice` on the FULL buffer (row index + token start as
    one multi-dim DUS, so the chain aliases in place — no per-row
    concat). Slot-occupancy semantics are IDENTICAL to
    `_ring_gather_merge` (the same mask math, evaluated on a kw-wide
    slice instead of the whole token axis), so a piece that also covers
    untouched or out-of-span slots writes back exactly what it read.

    buf: [L, B, H, T', *]; win: [L, B, H, KW, *]; pos0_b: traced scalar.
    """
    w = t_logical - sink
    last = pos0_b + kw - 1
    l, b, h = buf.shape[0], buf.shape[1], buf.shape[2]
    d = buf.shape[4]
    win_row = jax.lax.slice_in_dim(win, row, row + 1, axis=1)
    zero = jnp.int32(0)
    ri = jnp.int32(row)

    def merge_piece(buf, q, width):
        sl = jax.lax.dynamic_slice(
            buf, (zero, ri, zero, q, zero), (l, 1, h, width, d)
        )

        def gather_tok(tok_idx):
            ring_abs = last - jnp.mod(last - tok_idx, w)
            abs_ = jnp.where(tok_idx < sink, tok_idx, ring_abs)
            j = abs_ - pos0_b
            valid = (tok_idx < sink) | (abs_ >= sink)
            take = ((j >= 0) & (j < kw) & valid)[None, None, None, :, None]
            jc = jnp.clip(j, 0, kw - 1)[None, None, None, :, None]
            g = jnp.take_along_axis(win_row, jc, axis=3)
            return g, take

        if not packed:
            tok = q + jnp.arange(width)
            g, take = gather_tok(tok)
            sl = jnp.where(take, g, sl)
        else:
            rows = q + jnp.arange(width)
            g_lo, take_lo = gather_tok(2 * rows)
            g_hi, take_hi = gather_tok(2 * rows + 1)
            old_lo = sl & 0xF
            old_hi = sl >> 4
            nib_lo = jnp.where(take_lo, g_lo.astype(jnp.uint8) & 0xF, old_lo)
            nib_hi = jnp.where(take_hi, g_hi.astype(jnp.uint8) & 0xF, old_hi)
            sl = (nib_lo | (nib_hi << 4)).astype(jnp.uint8)
        return jax.lax.dynamic_update_slice(buf, sl, (zero, ri, zero, q, zero))

    if not packed:
        tb, width = t_logical, kw
        s1 = sink + jnp.mod(pos0_b - sink, w)  # ring slot of pos0
        q_sink = jnp.minimum(pos0_b, tb - width)
        q_ring0 = jnp.int32(sink)
    else:
        tb, width = t_logical // 2, kw // 2 + 1
        s1 = (sink + jnp.mod(pos0_b - sink, w)) // 2
        q_sink = jnp.minimum(pos0_b // 2, tb - width)
        q_ring0 = jnp.int32(sink // 2)
    # piece A: the non-wrapped ring span; piece B: the wrap-around back to
    # the ring start (mask-empty when the window does not wrap). B reads
    # AFTER A's write through the DUS chain, so overlap is harmless.
    buf = merge_piece(buf, jnp.minimum(s1, tb - width).astype(jnp.int32), width)
    buf = merge_piece(buf, q_ring0, width)
    if sink > 0:
        # pinned-slot piece: positions below `sink` land at slot == pos
        buf = merge_piece(buf, jnp.maximum(q_sink, 0).astype(jnp.int32), width)
    return buf


def _ring_piece_merge(buf, win, pos0, t_logical, packed, sink: int = 0):
    """Bounded-scratch equivalent of `_ring_gather_merge`: per batch row,
    2-3 static-width slice merges instead of one whole-buffer gather
    (whose full-cache scratch is why kv8 cannot fit 24+ serving slots —
    round-4 finding). Exactness vs the gather merge is tested
    (tests/test_windowed.py)."""
    kw = win.shape[3]
    if getattr(pos0, "ndim", 0) == 0:
        pos0 = pos0[None]
    b = buf.shape[1]
    for i in range(b):
        buf = _piece_merge_row(
            buf, win, i, pos0[i], t_logical, packed, sink, kw
        )
    return buf


def _use_piece_merge(packed: bool, sink: int) -> bool:
    """Piece merge handles every sink==0 case and even-sink unpacked
    caches; packed (int4) rows share bytes across the sink/ring boundary
    when sink is odd — those fall back to the gather merge."""
    import os as _os

    if _os.environ.get("L3Q_WINDOW_MERGE") == "gather":
        return False
    if sink == 0 or not packed:
        return True
    return sink % 2 == 0


def merge_window_into_cache(cache, w_bufs, pos0, cfg, sink: int = 0) -> Dict[str, jax.Array]:
    """Write the window buffers into the ring cache once per KW tokens.

    Default: the bounded-scratch piece merge (`_ring_piece_merge`) —
    touches only the 2-3 kw-wide slices the window maps onto, so the
    steady-state merge cost is O(window), not O(cache), and there is no
    full-cache gather scratch. `_ring_gather_merge` (one vectorized
    gather+where over the whole token axis) remains as the fallback for
    odd-sink packed layouts and for A/B via L3Q_WINDOW_MERGE=gather.
    `pos0` is the ABSOLUTE position of the window's first token."""
    wk, wks, wv, wvs = w_bufs
    int4 = cache["k_q"].dtype == jnp.uint8
    t_logical = cache["k_s"].shape[3]
    merge_q = (
        _ring_piece_merge if _use_piece_merge(int4, sink) else _ring_gather_merge
    )
    merge_s = (
        _ring_piece_merge if _use_piece_merge(False, sink) else _ring_gather_merge
    )
    return {
        "k_q": merge_q(cache["k_q"], wk, pos0, t_logical, int4, sink),
        "k_s": merge_s(cache["k_s"], wks, pos0, t_logical, False, sink),
        "v_q": merge_q(cache["v_q"], wv, pos0, t_logical, int4, sink),
        "v_s": merge_s(cache["v_s"], wvs, pos0, t_logical, False, sink),
    }


def decode_window(
    params,
    cache: Dict[str, jax.Array],
    tok0: jax.Array,  # [B, 1]
    pos0: jax.Array,  # scalar or [B]: position of tok0
    n_steps: int,
    cfg: ModelConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
    sample_key: Optional[jax.Array] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    sink_tokens: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """`n_steps` greedy/sampled tokens in ONE dispatch with write-combined
    cache updates. Returns (tokens [B, n_steps], updated cache)."""
    params = prepare_decode_params(params)
    b = tok0.shape[0]
    g, hd = cfg.num_kv_heads, cfg.head_dim_
    kw = n_steps
    int4 = cache["k_q"].dtype == jnp.uint8
    t_logical = cache["k_s"].shape[3]
    if kw >= t_logical - sink_tokens:
        # the merge maps window positions onto ring slots; a window
        # spanning the whole ring width would alias slots and keep the
        # OLDEST wrap. Callers chunk n_steps below the ring width instead.
        raise ValueError(
            f"decode_window n_steps={n_steps} must be < ring width "
            f"{t_logical - sink_tokens} (merge would self-alias)"
        )
    bt = 1024 if t_logical % 1024 == 0 else 512
    from .transformer import _DECODE_KERNEL

    interpret = _DECODE_KERNEL == "interpret"

    posv = pos0 if getattr(pos0, "ndim", 0) == 1 else jnp.broadcast_to(
        jnp.asarray(pos0, jnp.int32), (b,)
    )
    # main-cache visibility is frozen at the WINDOW START: sink+ring mask
    # for a query at pos0 - 1 (STRICTLY before the window — the slot at
    # pos0 holds stale data until the merge; the window segment supplies
    # every newer token). Loop-invariant across the window; ring aging
    # advances only at window granularity.
    _, mask0 = _ring_write_and_mask(posv - 1, 1, t_logical, sink_tokens)
    main_mask = _kernel_mask(mask0, b, t_logical)
    # pos0 == 0: nothing in the main cache is visible
    main_mask = jnp.where(posv[:, None] >= 1, main_mask, -1e30)

    L = cfg.num_layers
    w_bufs = (
        jnp.zeros((L, b, g, kw, hd), jnp.int8),
        jnp.ones((L, b, g, kw, 1), jnp.float32),
        jnp.zeros((L, b, g, kw, hd), jnp.int8),
        jnp.ones((L, b, g, kw, 1), jnp.float32),
    )

    if temperature > 0.0:
        from .transformer import sample_logits

    def body(carry, i):
        tok, pos, w_bufs = carry
        logits, w_bufs = _decode_step_windowed(
            params, cache, w_bufs, tok, pos, i, main_mask, cfg, rq, bt,
            interpret,
        )
        lg = logits[:, -1, :]
        if temperature > 0.0:
            nxt = sample_logits(
                lg, jax.random.fold_in(sample_key, i),
                temperature=temperature, top_k=top_k, top_p=top_p,
            )
        else:
            nxt = jnp.argmax(lg, axis=-1)
        nxt = nxt.astype(jnp.int32)
        return (nxt[:, None], pos + 1, w_bufs), nxt

    (_, _, w_bufs), toks = jax.lax.scan(
        body, (tok0.astype(jnp.int32), posv, w_bufs), jnp.arange(n_steps)
    )
    # the merge maps ABSOLUTE window positions onto sink+ring slots
    cache = merge_window_into_cache(cache, w_bufs, posv, cfg, sink_tokens)
    return toks.T, cache
