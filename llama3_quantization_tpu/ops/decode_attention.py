"""Pallas flash-decode attention over the heads-major KV cache.

Decode attention is a GQA matvec: one query token per sequence against the
whole [B, G, T, D] cache. XLA's einsum path tops out well under HBM
bandwidth at long T (~190-260 GB/s measured on v5e at T=4096 — the [1, T]
probs row and fp32 softmax round-trips keep it VPU-entangled). This kernel
streams the cache through VMEM in [BT, D] blocks with the standard
flash/online-softmax recurrence, so per block the only VPU work is one
exp over [rep, BT] and the MXU does two small dots — the HBM stream is
the critical path, which is the speed-of-light regime for decode.

The reference has no decode kernel at all (its eager fake-quant attention
materializes full score matrices,
`/root/reference/models/int_llama_layer.py:141-163`); this is the
TPU-native serving analogue of its `llama.py benchmark` decode path.

Semantics match the eager cache path (`models/transformer._attention` with
`kv_heads_major=True`) for s == 1: additive mask (finite -1e30 for
disallowed slots), fp32 scores/softmax, output cast to the query dtype.
The softmax-probs hook (`rq.p`) is NOT representable here (probs are never
normalized until the end); callers fall back to eager for it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # finite mask value: keeps the online recurrence NaN-free


def _decode_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref, acc_ref):
    """Grid (B, G, NT), T-blocks innermost; online-softmax state in scratch."""
    t = pl.program_id(2)
    nt = pl.num_programs(2)
    rep = q_ref.shape[2]

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # [rep, D]
    k = k_ref[0, 0]  # [BT, D]
    v = v_ref[0, 0]  # [BT, D]
    scale = 1.0 / math.sqrt(q.shape[-1])

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [rep, BT]
    # mask block is [B, BT] (a (1, BT) block would violate the sublane-8
    # tiling rule); pick this program's row
    s = s * scale + mask_ref[pl.program_id(0)][None, :]

    m_prev = m_ref[:rep, :1]  # [rep, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:rep, :1] = l_ref[:rep, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:rep, :1] = m_new
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rep, D]
    acc_ref[:rep] = acc_ref[:rep] * alpha + pv

    @pl.when(t == nt - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:rep] / l_ref[:rep, :1]).astype(o_ref.dtype)


def _split_s8_rows(a32):
    """Exact split of integer values in [-128, 119]: x = 16*hi + lo with
    hi, lo in [-8, 7] — two int4 operands standing in for one int8 (Mosaic
    rejects mixed s8 x i4 dots, so BOTH operands must be int4)."""
    lo = ((a32 & 15) ^ 8) - 8
    hi = (a32 - lo) >> 4
    return hi, lo


def _decode_kernel_s8(
    q_ref, kq_ref, ks_ref, vq_ref, vs_ref, mask_ref, o_ref, *rest,
    interpret=False, stats=False,
):
    """int8/int4-KV flash decode: codes go STRAIGHT to the MXU, per-token
    scales fold into the small [rep, BT] score matrix — the cache is never
    dequantized elementwise (the VPU trap that made the XLA quantized-KV
    path slower than bf16). Probs are re-quantized with the per-token V
    scale pre-folded, so PV is a second integer MXU dot; the extra probs
    rounding is the same compromise the reference itself makes with its
    softmax-probs quantizer (`quant/int_matmul.py`, rq.p).

    int4 caches arrive as T-pair-packed uint8 rows (`kvcache.kv4_pack`,
    block [BT/2, D]) and are BITCAST to int4 [BT, D] in VMEM — zero
    per-element unpack work; the activation side splits its s8 operand
    into two int4 rows (exact, `_split_s8_rows`) since Mosaic has no mixed
    s8 x i4 dot. This is what makes the 4-bit cache a BANDWIDTH win
    rather than kernel-parity-with-int8 (the round-1/2 nibble-unpack tax).

    Grid (B, NT) with ALL G head-groups inside each program: the per-
    program fixed cost (~7 us measured on v5e) dominates any per-(b, g)
    grid, so fewer/bigger programs is the lever that matters.

    `stats=True` adds two outputs (m, l online-softmax statistics,
    [1, g, rp, 128] blocks, col 0 meaningful) so callers can MERGE this
    result with attention over another key segment (the window-decode
    path)."""
    if stats:
        m_out_ref, l_out_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
        m_out_ref = l_out_ref = None
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    g_all = q_ref.shape[1]
    rep = q_ref.shape[2]
    rp = max(rep, 8)
    d = q_ref.shape[3]
    scale = 1.0 / math.sqrt(d)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    int4 = kq_ref.dtype == jnp.uint8  # T-pair-packed rows (kv4_pack)
    # int4 activations must split exactly: bound codes to +/-119
    amax = 119.0 if int4 else 127.0

    def qdot(ac, ref, g, dims):
        """ac s8/int32 [m, C] x codes [.., .] -> s32 [m, N]; dims are the
        dot_general contraction dims against the UNPACKED block."""
        blk = ref[0, g]
        if not int4:
            return jax.lax.dot_general(
                ac.astype(jnp.int8), blk, (dims, ((), ())),
                preferred_element_type=jnp.int32,
            )
        if interpret:
            # arithmetic unpack stand-in (no Mosaic bitcast off-TPU):
            # identical math — 16*hi + lo recombination is exact
            b32 = blk.astype(jnp.int32)
            lo = (((b32 & 0xF) ^ 8) - 8)[:, None, :]
            hi = ((((b32 >> 4) & 0xF) ^ 8) - 8)[:, None, :]
            c = jnp.concatenate([lo, hi], axis=1).reshape(
                blk.shape[0] * 2, blk.shape[1]
            ).astype(jnp.int8)
            return jax.lax.dot_general(
                ac.astype(jnp.int8), c, (dims, ((), ())),
                preferred_element_type=jnp.int32,
            )
        c4 = pltpu.bitcast(blk, jnp.int4)  # [BT, D], natural order
        m = ac.shape[0]
        hi, lo = _split_s8_rows(ac.astype(jnp.int32))
        st = jnp.concatenate([hi, lo], axis=0).astype(jnp.int4)  # [2m, C]
        p = jax.lax.dot_general(
            st, c4, (dims, ((), ())), preferred_element_type=jnp.int32
        )
        return 16 * p[:m] + p[m:]

    msk = mask_ref[pl.program_id(0)][None, :]
    for g in range(g_all):  # static unroll: one MXU-dot pair per group
        q = q_ref[0, g].astype(jnp.float32)  # [rep, D]
        qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        qs = jnp.maximum(qa, 1e-8) / amax
        qc = jnp.clip(jnp.round(q / qs), -amax, amax).astype(jnp.int8)

        s32 = qdot(qc, kq_ref, g, ((1,), (1,)))  # [rep, BT]
        s = s32.astype(jnp.float32) * (qs * scale) * ks_ref[0, g] + msk

        m_prev = m_ref[g * rp : g * rp + rep, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [rep, BT]
        l_ref[g * rp : g * rp + rep, :1] = (
            l_ref[g * rp : g * rp + rep, :1] * alpha
            + jnp.sum(p, axis=-1, keepdims=True)
        )
        m_ref[g * rp : g * rp + rep, :1] = m_new

        pv_f = p * vs_ref[0, g]
        pa = jnp.max(jnp.abs(pv_f), axis=-1, keepdims=True)
        ps = jnp.maximum(pa, 1e-20) / amax
        pc = jnp.clip(jnp.round(pv_f / ps), -amax, amax).astype(jnp.int8)
        pv32 = qdot(pc, vq_ref, g, ((1,), (0,)))  # [rep, D]
        acc_ref[g * rp : g * rp + rep] = (
            acc_ref[g * rp : g * rp + rep] * alpha
            + pv32.astype(jnp.float32) * ps
        )

    @pl.when(t == nt - 1)
    def _():
        for g in range(g_all):
            # safe divide: an all-masked cache (window decode with an
            # empty main segment) leaves l == 0 — emit 0, the merge
            # weights it out via l
            o_ref[0, g] = (
                acc_ref[g * rp : g * rp + rep]
                / jnp.maximum(l_ref[g * rp : g * rp + rep, :1], 1e-30)
            ).astype(o_ref.dtype)
            if m_out_ref is not None:
                m_out_ref[0, g] = m_ref[g * rp : (g + 1) * rp]
                l_out_ref[0, g] = l_ref[g * rp : (g + 1) * rp]


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_t", "interpret"))
def flash_decode_gqa_s8(
    q: jax.Array,  # [B, 1, Hq, D]
    k_q: jax.Array,  # [B, G, T, D] int8 codes — or uint8 [B, G, T/2, D]
    #                  int4 T-pair pack (ops/kvcache.kv4_pack)
    k_s: jax.Array,  # [B, G, T, 1] f32 per-(token, head) scales
    v_q: jax.Array,
    v_s: jax.Array,
    mask: jax.Array,  # [B, T] additive fp32, finite (-1e30) for masked
    out_dtype=jnp.bfloat16,
    block_t: int = 1024,
    interpret: bool = False,
) -> jax.Array:  # [B, 1, Hq, D]
    b, s, hq, d = q.shape
    assert s == 1, "flash decode is single-token"
    int4 = k_q.dtype == jnp.uint8
    g = k_q.shape[1]
    t = k_q.shape[2] * (2 if int4 else 1)  # logical tokens
    rep = hq // g
    bt = min(block_t, t)
    assert t % bt == 0, f"cache len {t} must be a multiple of block {bt}"
    btr = bt // 2 if int4 else bt  # packed code rows per block
    qg = q.reshape(b, g, rep, d)
    mask = mask.astype(jnp.float32)
    # scales lane-major: a [BT, 1] f32 block pads to 128 lanes in VMEM
    # (2 MB at BT=4096 — wrecks double buffering); [1, BT] stays 4*BT bytes
    k_s = k_s.reshape(b, g, 1, t)
    v_s = v_s.reshape(b, g, 1, t)

    grid = (b, t // bt)
    rp = max(rep, 8)
    kv_spec = pl.BlockSpec((1, g, btr, d), lambda i, k_: (i, 0, k_, 0))
    sc_spec = pl.BlockSpec((1, g, 1, bt), lambda i, k_: (i, 0, 0, k_))
    out = pl.pallas_call(
        functools.partial(_decode_kernel_s8, interpret=interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, g, rep, d), lambda i, k_: (i, 0, 0, 0)),
            kv_spec, sc_spec, kv_spec, sc_spec,
            pl.BlockSpec((b, bt), lambda i, k_: (0, k_)),
        ],
        out_specs=pl.BlockSpec((1, g, rep, d), lambda i, k_: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, g, rep, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((g * rp, 128), jnp.float32),  # m (col 0 used)
            pltpu.VMEM((g * rp, 128), jnp.float32),  # l (col 0 used)
            pltpu.VMEM((g * rp, d), jnp.float32),  # acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * d,
            bytes_accessed=2 * b * g * t * ((d // 2 if int4 else d) + 4),
            transcendentals=b * hq * t,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qg, k_q, k_s, v_q, v_s, mask)
    return out.reshape(b, 1, hq, d)


def _decode_kernel_s8_stacked(
    lidx_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, mask_ref, o_ref,
    *rest, interpret=False, stats=False,
):
    """Layer-stacked int8 flash decode: the cache refs carry a leading
    (block-size-1) layer axis selected by the scalar-prefetched layer
    index in the BlockSpec index_maps; the body is the per-layer kernel
    over `.at[0]` sub-refs. This lets the decode layer-scan read the
    SINGLE stacked cache buffer in place — no per-layer dynamic-slice
    materialization, no xs/ys cache streaming (the round-1 b8 trace's two
    ~0.41 ms/step cache copies)."""
    del lidx_ref  # consumed by the index_maps
    _decode_kernel_s8(
        q_ref, kq_ref.at[0], ks_ref.at[0], vq_ref.at[0], vs_ref.at[0],
        mask_ref, o_ref, *rest, interpret=interpret, stats=stats,
    )


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_t", "interpret", "return_stats")
)
def flash_decode_gqa_s8_stacked(
    q: jax.Array,  # [B, 1, Hq, D]
    k_q: jax.Array,  # [L, B, G, T, D] int8 — or uint8 [L, B, G, T/2, D]
    #                  int4 T-pair pack (ops/kvcache.kv4_pack)
    k_s: jax.Array,  # [L, B, G, T, 1]
    v_q: jax.Array,
    v_s: jax.Array,
    mask: jax.Array,  # [B, T]
    layer,  # scalar int32: which layer's cache to read
    out_dtype=jnp.bfloat16,
    block_t: int = 1024,
    interpret: bool = False,
    return_stats: bool = False,
):  # [B, 1, Hq, D]  (+ (m, l) [B, G, rep] f32 when return_stats)
    b, s, hq, d = q.shape
    assert s == 1, "flash decode is single-token"
    int4 = k_q.dtype == jnp.uint8
    g = k_q.shape[2]
    t = k_q.shape[3] * (2 if int4 else 1)  # logical tokens
    rep = hq // g
    bt = min(block_t, t)
    assert t % bt == 0, f"cache len {t} must be a multiple of block {bt}"
    btr = bt // 2 if int4 else bt  # packed code rows per block
    qg = q.reshape(b, g, rep, d)
    mask = mask.astype(jnp.float32)
    ks5 = k_s.reshape(*k_s.shape[:2], g, 1, t)
    vs5 = v_s.reshape(*v_s.shape[:2], g, 1, t)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    grid = (b, t // bt)
    rp = max(rep, 8)
    kv_spec = pl.BlockSpec((1, 1, g, btr, d), lambda i, k_, l: (l[0], i, 0, k_, 0))
    sc_spec = pl.BlockSpec((1, 1, g, 1, bt), lambda i, k_, l: (l[0], i, 0, 0, k_))
    o_spec = pl.BlockSpec((1, g, rep, d), lambda i, k_, l: (i, 0, 0, 0))
    out_specs = o_spec
    out_shape = jax.ShapeDtypeStruct((b, g, rep, d), out_dtype)
    if return_stats:
        st_spec = pl.BlockSpec((1, g, rp, 128), lambda i, k_, l: (i, 0, 0, 0))
        out_specs = (o_spec, st_spec, st_spec)
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((b, g, rp, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, g, rp, 128), jnp.float32),
        )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel_s8_stacked, interpret=interpret, stats=return_stats
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, g, rep, d), lambda i, k_, l: (i, 0, 0, 0)),
                kv_spec, sc_spec, kv_spec, sc_spec,
                pl.BlockSpec((b, bt), lambda i, k_, l: (0, k_)),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((g * rp, 128), jnp.float32),
                pltpu.VMEM((g * rp, 128), jnp.float32),
                pltpu.VMEM((g * rp, d), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * d,
            bytes_accessed=2 * b * g * t * ((d // 2 if int4 else d) + 4),
            transcendentals=b * hq * t,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lidx, qg, k_q, ks5, v_q, vs5, mask)
    if return_stats:
        o, m_st, l_st = out
        return (
            o.reshape(b, 1, hq, d),
            m_st[:, :, :rep, 0],  # [B, G, rep]
            l_st[:, :, :rep, 0],
        )
    return out.reshape(b, 1, hq, d)


def _decode_kernel_stacked(
    lidx_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref, acc_ref
):
    del lidx_ref
    _decode_kernel(
        q_ref, k_ref.at[0], v_ref.at[0], mask_ref, o_ref, m_ref, l_ref, acc_ref
    )


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def flash_decode_gqa_stacked(
    q: jax.Array,  # [B, 1, Hq, D]
    k: jax.Array,  # [L, B, G, T, D]
    v: jax.Array,
    mask: jax.Array,  # [B, T]
    layer,
    block_t: int = 512,
    interpret: bool = False,
) -> jax.Array:
    b, s, hq, d = q.shape
    assert s == 1, "flash decode is single-token"
    g, t = k.shape[2], k.shape[3]
    rep = hq // g
    bt = min(block_t, t)
    assert t % bt == 0, f"cache len {t} must be a multiple of block {bt}"
    qg = q.reshape(b, g, rep, d)
    mask = mask.astype(jnp.float32)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    grid = (b, g, t // bt)
    rp = max(rep, 8)
    out = pl.pallas_call(
        _decode_kernel_stacked,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, rep, d), lambda i, j, k_, l: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, bt, d), lambda i, j, k_, l: (l[0], i, j, k_, 0)),
                pl.BlockSpec((1, 1, 1, bt, d), lambda i, j, k_, l: (l[0], i, j, k_, 0)),
                pl.BlockSpec((b, bt), lambda i, j, k_, l: (0, k_)),
            ],
            out_specs=pl.BlockSpec((1, 1, rep, d), lambda i, j, k_, l: (i, j, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((rp, 128), jnp.float32),
                pltpu.VMEM((rp, 128), jnp.float32),
                pltpu.VMEM((rp, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, rep, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * d,
            bytes_accessed=2 * b * g * t * d * k.dtype.itemsize,
            transcendentals=b * hq * t,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lidx, qg, k, v, mask)
    return out.reshape(b, 1, hq, d)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def flash_decode_gqa(
    q: jax.Array,  # [B, 1, Hq, D]
    k: jax.Array,  # [B, G, T, D] heads-major cache (bf16/fp32)
    v: jax.Array,  # [B, G, T, D]
    mask: jax.Array,  # [B, T] additive fp32, finite (-1e30) for masked
    block_t: int = 512,
    interpret: bool = False,
) -> jax.Array:  # [B, 1, Hq, D]
    b, s, hq, d = q.shape
    assert s == 1, "flash decode is single-token"
    g, t = k.shape[1], k.shape[2]
    rep = hq // g
    bt = min(block_t, t)
    assert t % bt == 0, f"cache len {t} must be a multiple of block {bt}"
    qg = q.reshape(b, g, rep, d)
    mask = mask.astype(jnp.float32)

    grid = (b, g, t // bt)
    rp = max(rep, 8)
    out = pl.pallas_call(
        _decode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda i, j, k_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, bt, d), lambda i, j, k_: (i, j, k_, 0)),
            pl.BlockSpec((1, 1, bt, d), lambda i, j, k_: (i, j, k_, 0)),
            pl.BlockSpec((b, bt), lambda i, j, k_: (0, k_)),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda i, j, k_: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, g, rep, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rp, 128), jnp.float32),  # m (col 0 used)
            pltpu.VMEM((rp, 128), jnp.float32),  # l (col 0 used)
            pltpu.VMEM((rp, d), jnp.float32),  # acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * d,
            bytes_accessed=2 * b * g * t * d * k.dtype.itemsize,
            transcendentals=b * hq * t,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qg, k, v, mask)
    return out.reshape(b, 1, hq, d)


def _xla_s8_core(qg, kq, ks, vq, vs, mask, return_stats=False):
    """Shared math of the XLA codes-direct path: qg [B, G, rep, D] f32,
    kq/vq [B, G, T, D] int8, ks/vs [B, G, T] f32, mask [B, T] additive.
    Returns (o [B, G, rep, D] f32, m, l) — o normalized; m/l the online-
    softmax statistics (for window merges)."""
    b, g, rep, d = qg.shape
    scale = 1.0 / math.sqrt(d)
    qa = jnp.max(jnp.abs(qg), axis=-1, keepdims=True)
    qs = jnp.maximum(qa, 1e-8) / 127.0
    qc = jnp.clip(jnp.round(qg / qs), -127, 127).astype(jnp.int8)
    s32 = jax.lax.dot_general(
        qc, kq, (((3,), (3,)), ((0, 1), (0, 1))), preferred_element_type=jnp.int32
    )  # [B, G, rep, T]
    s = (
        s32.astype(jnp.float32) * (qs * scale)
        * ks[:, :, None, :]
        + mask[:, None, None, :]
    )
    m = jnp.max(s, axis=-1)  # [B, G, rep]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    pv_f = p * vs[:, :, None, :]
    pa = jnp.max(jnp.abs(pv_f), axis=-1, keepdims=True)
    ps = jnp.maximum(pa, 1e-20) / 127.0
    pc = jnp.clip(jnp.round(pv_f / ps), -127, 127).astype(jnp.int8)
    pv32 = jax.lax.dot_general(
        pc, vq, (((3,), (2,)), ((0, 1), (0, 1))), preferred_element_type=jnp.int32
    )  # [B, G, rep, D]
    o = pv32.astype(jnp.float32) * ps / jnp.maximum(l, 1e-30)[..., None]
    return o, m, l


def xla_decode_gqa_s8(
    q: jax.Array,  # [B, 1, Hq, D]
    k_q: jax.Array,  # [B, G, T, D] int8 codes (NOT the uint8 int4 pack)
    k_s: jax.Array,  # [B, G, T, 1]
    v_q: jax.Array,
    v_s: jax.Array,
    mask: jax.Array,  # [B, T] additive fp32, finite
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """int8-KV decode attention as two batched XLA MXU dots, codes direct.

    Same math as `flash_decode_gqa_s8` (q and probs quantized to s8 with
    the per-token scales folded post-dot) WITHOUT Pallas: on this libtpu
    every Pallas formulation is capped at ~0.3-0.4 of the HBM bus by its
    DMA path while XLA dots stream 0.83-1.0 (docs/BENCH_NOTES.md round 4)
    — so the dots that read the cache should be XLA dots. The [B,G,rep,T]
    score/prob intermediates this materializes are trivial next to the
    cache bytes. int4 (uint8-packed) caches stay on the Pallas kernel:
    unpacking them in XLA materializes the whole cache per step."""
    b, s, hq, d = q.shape
    assert s == 1, "decode attention is single-token"
    g, t = k_q.shape[1], k_q.shape[2]
    qg = q.reshape(b, g, hq // g, d).astype(jnp.float32)
    o, _, _ = _xla_s8_core(
        qg, k_q, k_s.reshape(b, g, t), v_q, v_s.reshape(b, g, t),
        mask.astype(jnp.float32),
    )
    return o.reshape(b, 1, hq, d).astype(out_dtype)


def xla_decode_gqa_s8_stacked(
    q: jax.Array,  # [B, 1, Hq, D]
    k_q: jax.Array,  # [L, B, G, T, D] int8
    k_s: jax.Array,  # [L, B, G, T, 1]
    v_q: jax.Array,
    v_s: jax.Array,
    mask: jax.Array,  # [B, T]
    layer,  # scalar int32
    out_dtype=jnp.bfloat16,
    return_stats: bool = False,
):
    """Layer-stacked variant: per-layer views via one dynamic slice per
    buffer. Each slice has exactly ONE consumer (its dot / its scale
    multiply) so XLA fuses it into the read instead of materializing a
    per-layer cache copy (the round-3 multi-consumer trap is what this
    rule guards against). `return_stats` adds (m, l) for the windowed
    online-softmax merge."""
    b, s, hq, d = q.shape
    assert s == 1, "decode attention is single-token"
    g, t = k_q.shape[2], k_q.shape[3]
    li = jnp.asarray(layer, jnp.int32)

    def lslice(buf):
        return jax.lax.dynamic_index_in_dim(buf, li, axis=0, keepdims=False)

    qg = q.reshape(b, g, hq // g, d).astype(jnp.float32)
    o, m, l = _xla_s8_core(
        qg, lslice(k_q), lslice(k_s).reshape(b, g, t), lslice(v_q),
        lslice(v_s).reshape(b, g, t), mask.astype(jnp.float32),
    )
    out = o.reshape(b, 1, hq, d).astype(out_dtype)
    if return_stats:
        return out, m, l
    return out
