"""Sub-byte weight packing for the real-quant storage format.

The reference delegates packed-int storage to AutoGPTQ's CUDA/Triton qlinear
modules (`/root/reference/quant/omniquant.py:315-335`). On TPU we define our
own layout, chosen to make the Pallas fused dequant-matmul kernel's unpack a
pure bitwise-shift + concat along the sublane axis:

Weights are stored `[K, N]` (contraction axis first). For `bits in {2, 4}`,
`f = 8 // bits` values share one uint8 byte. Packing is **group-local**: the
K axis is viewed as `(G, group_size)`; within each group, value
`q[g, s * group_size//f + j]` lands in bits `[s*bits, (s+1)*bits)` of packed
byte `(g, j)`. Unpacking a whole group is then

    concat([(byte >> s*bits) & mask for s in range(f)], axis=K)

which preserves K order and never crosses group boundaries, so a kernel whose
K tile is a multiple of `group_size` can unpack locally in VMEM.

int8 / int3 fall back to one-value-per-byte (int3 packing into 3-bit fields
spans byte boundaries and is not worth the unpack cost on TPU's VPU).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def pack_factor(bits: int) -> int:
    """Values per byte for the nibble scheme. 1 for bits not in {2, 4}
    (3-bit uses the bit-plane scheme; see `packed_rows`)."""
    return 8 // bits if bits in (2, 4) else 1


def packed_rows(k: int, bits: int) -> int:
    """Packed byte-rows for a K-row code matrix."""
    if bits in (2, 4):
        return k // (8 // bits)
    if bits == 3:
        return 3 * k // 8
    return k


def _pack_planes(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Bit-plane packing: plane b holds bit b of every code, 8 codes/byte
    along K. Exactly `bits` bits/weight for ANY width; used for 3-bit
    (the nibble scheme needs bits | 8)."""
    k, n = q.shape
    if k % 8:
        raise ValueError(f"K={k} must be a multiple of 8 for plane packing")
    weights = (1 << np.arange(8)).astype(np.uint32)
    planes = []
    for b in range(bits):
        bit = ((q.astype(jnp.uint32) >> b) & 1).reshape(k // 8, 8, n)
        planes.append(
            jnp.sum(bit * weights[None, :, None], axis=1).astype(jnp.uint8)
        )
    return jnp.concatenate(planes, axis=0)  # [bits*K/8, N]


def _unpack_planes(packed: jnp.ndarray, bits: int, k: int) -> jnp.ndarray:
    n = packed.shape[-1]
    planes = packed.reshape(bits, k // 8, n)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    out = jnp.zeros((k, n), jnp.uint8)
    for b in range(bits):
        expanded = jnp.repeat(planes[b], 8, axis=0)  # [K, N]
        bit = (expanded >> jnp.tile(shifts, k // 8)[:, None]) & 1
        out = out | (bit.astype(jnp.uint8) << b)
    return out


def _group_view(k: int, group_size: Optional[int]) -> int:
    gs = group_size or k
    if k % gs:
        raise ValueError(f"K={k} not a multiple of group_size={gs}")
    return gs


def pack_subbyte(q: jnp.ndarray, bits: int, group_size: Optional[int] = None) -> jnp.ndarray:
    """Pack unsigned int codes `q[K, N]` (values in [0, 2^bits)) into uint8.

    Returns `[K // f, N]` uint8 with the group-local layout described above.
    """
    f = pack_factor(bits)
    if bits == 3:
        return _pack_planes(q.astype(jnp.uint8), bits)
    if f == 1:
        return q.astype(jnp.uint8)
    k, n = q.shape
    gs = _group_view(k, group_size)
    if gs % f:
        raise ValueError(f"group_size={gs} must be a multiple of {f} for {bits}-bit packing")
    sub = gs // f
    # (G, f, sub, N): axis 1 indexes which bit-field each value lands in
    qg = q.astype(jnp.uint8).reshape(k // gs, f, sub, n)
    packed = jnp.zeros((k // gs, sub, n), jnp.uint8)
    for s in range(f):
        packed = packed | (qg[:, s] << (s * bits))
    return packed.reshape(k // f, n)


def unpack_subbyte(
    packed: jnp.ndarray, bits: int, k: int, group_size: Optional[int] = None
) -> jnp.ndarray:
    """Inverse of `pack_subbyte`: packed bytes -> uint8 codes `[K, N]`."""
    f = pack_factor(bits)
    if bits == 3:
        return _unpack_planes(packed, bits, k)
    if f == 1:
        return packed
    gs = _group_view(k, group_size)
    sub = gs // f
    n = packed.shape[-1]
    pg = packed.reshape(k // gs, sub, n)
    mask = np.uint8(2**bits - 1)
    parts = [(pg >> (s * bits)) & mask for s in range(f)]
    return jnp.stack(parts, axis=1).reshape(k, n)
