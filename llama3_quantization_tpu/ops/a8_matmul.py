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
        # per-tensor scales, e.g. the serving recode of quant/serving.py)
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
