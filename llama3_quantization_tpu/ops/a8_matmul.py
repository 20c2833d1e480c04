"""W·A8 quantized matmul on the TPU's native s8×s8 MXU path.

Measured on v5e: `jnp.dot(int8, int8)` sustains full HBM bandwidth
(~819 GB/s of weight bytes) with ZERO per-element VPU work, while any
dequantize-to-bf16 formulation is VPU-bound at ~200-340 GB/s. So the fast
decode path quantizes activations per token to int8 and keeps weights as
*centered signed int8 codes* (the unpacked QuantizedTensor storage),
applying group scales AFTER the matmul:

    y[b, n] = s_x[b] · Σ_g  s[g, n] · ( (x_q[b, g, :] @ c[g, :, n])
                                        − z[g, n] · Σ_k x_q[b, g, k] )

The per-group contraction is one batched s8 dot_general (batch = groups);
the scale/zero corrections touch only [G, B, N] partials — negligible.

This is W4A8/W8A8 *compute* (the reference's SmoothQuant W8A8 regime,
`quant/omniquant.py` act quant path); the bf16-accurate dequant matmul
remains the default backend for score-parity evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant.qtensor import QuantizedTensor


def quantize_activations_s8(x: jax.Array):
    """Per-row (token) symmetric int8: returns (x_q int8, scale f32 [..., 1]).

    Same last-axis absmax/127 routine as the KV cache's `kv_quantize` —
    one shared implementation so the two quantizers cannot drift."""
    from .kvcache import kv_quantize

    return kv_quantize(x)


#: narrowest N routed through the K-split matvec. Decoder-linear dots
#: (N <= 28672 at 8B) already stream at ~819 GB/s full-K; only the very
#: wide lm_head dot ([4096, 128256]) is element-rate-capped at m=1
#: (~420-460 Ge/s measured regardless of dtype). The threshold keeps the
#: proven full-K path everywhere the cap does not bite.
KSPLIT_MIN_N = int(__import__("os").environ.get("L3Q_KSPLIT_MIN_N", 65536))
#: K-split row count (m = B * KSPLIT_G). 4-32 all measure alike
#: (scripts/microbench_head.py: int8 660 GB/s, int4 1.09 Te/s at m=16);
#: 16 keeps m MXU-friendly without inflating the block-diagonal build
KSPLIT_G = 16


def matvec_ksplit(xq: jax.Array, c: jax.Array, g: int) -> jax.Array:
    """Wide-N decode matvec: `xq s8 [B, K] @ c int8/int4 [K, N] -> s32`.

    The m=1 full-K dot runs element-rate-bound (~456 Ge/s) when N is very
    large; splitting K into `g` chunks placed on separate rows of a
    block-diagonal [B*g, K] operand (the same embedding `s4_matmul` uses
    for group scales) lifts the stream to ~660 GB/s (s8) / ~1.09 Te/s
    (s4) — measured 2.6x on the [4096, 128256] head
    (scripts/microbench_head.py). Exact: integer partials are summed
    before any scaling."""
    b, k = xq.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, k), 1)
    sel = (cols // (k // g)) == rows  # [g, K], loop-invariant
    bd = jnp.where(sel[None], xq[:, None, :], jnp.int8(0)).reshape(b * g, k)
    p = jax.lax.dot_general(
        bd, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [B*g, N]
    return jnp.sum(p.reshape(b, g, -1), axis=1)  # [B, N]


def _use_ksplit(b: int, k: int, n: int) -> bool:
    return b <= 8 and n >= KSPLIT_MIN_N and k % KSPLIT_G == 0


def a8_matmul(x: jax.Array, qt: QuantizedTensor, out_dtype=None) -> jax.Array:
    """`x @ dequant(qt)` computed via the native s8 MXU path."""
    if qt.packed:
        raise ValueError("a8 path requires unpacked (int8-container) storage")
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2d = x.reshape(-1, qt.k)
    b = x2d.shape[0]
    gs = qt.group_size or qt.k
    g = qt.k // gs

    xq, s_x = quantize_activations_s8(x2d)  # [B, K], [B, 1]

    if g == 1:
        # single full-K s8 dot — the speed-of-light path (per-column or
        # per-tensor scales, e.g. the serving recode of quant/serving.py);
        # very wide N (the lm_head) takes the K-split matvec instead
        if _use_ksplit(b, qt.k, qt.n):
            acc = matvec_ksplit(xq, qt.data, KSPLIT_G).astype(jnp.float32)
        else:
            acc = jax.lax.dot_general(
                xq, qt.data,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        if qt.zero is not None:
            xsum1 = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
            acc = acc - xsum1.astype(jnp.float32) * qt.zero[0][None, :]
        y = acc * qt.scale[0][None, :] * s_x
        return y.astype(out_dtype).reshape(*lead, qt.n)

    xg = xq.reshape(b, g, gs)
    cg = qt.data.reshape(g, gs, qt.n)
    # batched s8 x s8 -> s32: contract gs, batch g
    parts = jax.lax.dot_general(
        xg,
        cg,
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [G, B, N]
    xsum = jnp.sum(xg.astype(jnp.int32), axis=2)  # [B, G]
    if qt.zero is not None:
        corr = xsum.T[:, :, None].astype(jnp.float32) * qt.zero[:, None, :]
        partsf = parts.astype(jnp.float32) - corr
    else:
        partsf = parts.astype(jnp.float32)
    y = jnp.sum(partsf * qt.scale[:, None, :], axis=0)  # [B, N]
    y = y * s_x
    return y.astype(out_dtype).reshape(*lead, qt.n)
