"""QuantizedTensor — the packed-weight pytree at the center of the framework.

Where the reference stores quantization state inside swapped nn.Modules
(`/root/reference/quant/int_linear.py`), here a quantized weight is a plain
pytree value that can live anywhere a `jax.Array` can: inside model params,
under `jit`, sharded by GSPMD, checkpointed by orbax.

Layout convention: weights are `[K, N]` (in-features first) so the forward
is `y = x @ W`; groups run along K (the contraction axis — same grouping as
the reference's per-output-channel-row over input dims, transposed). Scales
and zero points are `[G, N]`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .pack import pack_subbyte, unpack_subbyte
from .quantizer import QuantSpec, minmax_scale_zp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "scale", "zero", "g_idx"],
    meta_fields=["bits", "group_size", "sym", "k", "n", "packed", "out_dtype"],
)
@dataclasses.dataclass
class QuantizedTensor:
    """Packed integer weight + grouped dequant parameters.

    data:  uint8 `[K/f, N]` when `packed` else int code uint8/int8 `[K, N]`
    scale: `[G, N]` float32
    zero:  `[G, N]` float32 integer-valued zero point, or None (symmetric,
           codes are then signed offsets around 0 stored biased by qmax/2…
           we keep the reference convention: unsigned codes + zero point;
           `zero=None` means codes are signed int8 in [qmin, qmax]).
    g_idx: optional `[K]` int32 column→group map (GPTQ act-order with
           grouping: group membership follows the activation-order
           permutation, so it is not `k // group_size` — AutoGPTQ's
           permuted-`g_idx` storage, `/root/reference/gptq.py:216-219`).
           None means contiguous groups. Tensors carrying a g_idx ride the
           XLA dequant path (the packed/a8/s4 kernels require contiguous
           groups).
    """

    data: jax.Array
    scale: jax.Array
    zero: Optional[jax.Array]
    bits: int = 4
    group_size: Optional[int] = None
    sym: bool = False
    k: int = 0
    n: int = 0
    packed: bool = False
    out_dtype: jnp.dtype = jnp.bfloat16
    g_idx: Optional[jax.Array] = None

    @property
    def shape(self):
        return (self.k, self.n)

    @property
    def num_groups(self) -> int:
        return self.scale.shape[0]

    def nbytes_ideal(self) -> int:
        """Ideal packed size in bytes (for bandwidth accounting)."""
        return self.k * self.n * self.bits // 8 + self.scale.size * 4 + (
            self.zero.size * 4 if self.zero is not None else 0
        )


def _codes(qt: QuantizedTensor) -> jax.Array:
    if qt.packed:
        return unpack_subbyte(qt.data, qt.bits, qt.k, qt.group_size)
    return qt.data


def dequantize(qt: QuantizedTensor, dtype=None) -> jax.Array:
    """Codes -> real weights `[K, N]`: `(q - zero) * scale` per group."""
    dtype = dtype or qt.out_dtype
    q = _codes(qt)
    if qt.g_idx is not None:
        # act-order grouping: per-column params gathered by the column→group
        # map (matches AutoGPTQ's g_idx dequant)
        qf = q.astype(jnp.float32)
        scale_pc = qt.scale[qt.g_idx]  # [K, N]
        if qt.zero is not None:
            qf = qf - qt.zero[qt.g_idx]
        return (qf * scale_pc).astype(dtype)
    gs = qt.group_size or qt.k
    qg = q.reshape(qt.num_groups, gs, qt.n).astype(jnp.float32)
    if qt.zero is not None:
        qg = qg - qt.zero[:, None, :]
    w = qg * qt.scale[:, None, :]
    return w.reshape(qt.k, qt.n).astype(dtype)


def quantize_rtn(
    w: jax.Array,
    spec: QuantSpec,
    pack: bool = False,
    lwc_up: Optional[jax.Array] = None,
    lwc_low: Optional[jax.Array] = None,
) -> QuantizedTensor:
    """Round-to-nearest real quantization of a `[K, N]` weight.

    Numerically identical codes/scales to the reference fake-quant RTN path
    (`quant/quantizer.py:118-130` with per-channel/per-group minmax), stored
    packed instead of re-fake-quantized every forward (the reference's
    per-call re-quantization is its main slowdown — SURVEY.md §3.2).
    """
    k, n = w.shape
    if not spec.enabled:
        raise ValueError(
            "n_bits >= 16 disables quantization (reference quantizer.forward "
            "passthrough, quant/quantizer.py:119) — keep the fp weight instead"
        )
    if spec.n_bits > 8:
        raise NotImplementedError(
            f"{spec.n_bits}-bit codes exceed int8 storage; use fake-quant "
            "(fake_quant_dynamic) for 9-15 bit studies"
        )
    gs = spec.group_size or k
    if k % gs:
        raise ValueError(f"K={k} not divisible by group_size={gs}")
    wt = w.astype(jnp.float32).T  # [N, K] — reference row-major layout
    scale, zp = minmax_scale_zp(wt, spec, lwc_up, lwc_low)  # [N, G, 1] or [N, 1]
    grouped = wt.reshape(n, k // gs, gs)
    scale_b = scale.reshape(n, -1, 1)
    q = jnp.round(grouped / scale_b)
    if zp is not None:
        q = q + zp.reshape(n, -1, 1)
    q = jnp.clip(q, spec.qmin, spec.qmax)
    scale_gn = scale.reshape(n, -1).T  # [G, N]
    zero_gn = zp.reshape(n, -1).T if zp is not None else None
    if not pack and zp is not None:
        # unpacked asym storage: center codes into signed int8 (q - 2^(b-1))
        # with the zero point shifted to match — signed codes feed the TPU's
        # native s8 x s8 MXU path (ops/matmul.py "a8" backend) directly
        off = 2 ** (spec.n_bits - 1)
        codes = (q.reshape(n, k).T - off).astype(jnp.int8)
        zero_gn = zero_gn - off
        return QuantizedTensor(
            data=codes,
            scale=scale_gn,
            zero=zero_gn,
            bits=spec.n_bits,
            group_size=spec.group_size,
            sym=False,
            k=k,
            n=n,
            packed=False,
            out_dtype=w.dtype if jnp.issubdtype(w.dtype, jnp.floating) else jnp.bfloat16,
        )
    code_dtype = jnp.int8 if zp is None else jnp.uint8
    codes = q.reshape(n, k).T.astype(code_dtype)  # [K, N]
    packable = spec.n_bits in (2, 3, 4)
    if pack and zp is not None and packable:
        data = pack_subbyte(codes, spec.n_bits, spec.group_size)
        packed = True
    elif pack and zp is None and packable:
        # signed codes: bias into unsigned range for packing
        biased = (q.reshape(n, k).T - spec.qmin).astype(jnp.uint8)
        data = pack_subbyte(biased, spec.n_bits, spec.group_size)
        packed = True
        zero_gn = jnp.full((k // gs, n), float(-spec.qmin), jnp.float32)
    else:
        data, packed = codes, False
    return QuantizedTensor(
        data=data,
        scale=scale_gn,
        zero=zero_gn,
        bits=spec.n_bits,
        group_size=spec.group_size,
        sym=spec.symmetric or spec.disable_zero_point,
        k=k,
        n=n,
        packed=packed,
        out_dtype=w.dtype if jnp.issubdtype(w.dtype, jnp.floating) else jnp.bfloat16,
    )


def from_codes(
    codes: jax.Array,
    scale: jax.Array,
    zero: Optional[jax.Array],
    spec: QuantSpec,
    pack: bool = False,
    out_dtype=jnp.bfloat16,
    g_idx: Optional[jax.Array] = None,
) -> QuantizedTensor:
    """Build a QuantizedTensor from already-computed codes `[K, N]` and
    grouped params `[G, N]` (used by GPTQ/AWQ/HQQ which find their own
    scales). `g_idx` ([K] int32) carries a non-contiguous column→group map
    (GPTQ act-order with grouping)."""
    k, n = codes.shape
    if pack and zero is not None and spec.n_bits in (2, 3, 4):
        data = pack_subbyte(codes.astype(jnp.uint8), spec.n_bits, spec.group_size)
        packed = True
    elif zero is not None:
        # centered signed storage (see quantize_rtn) for the s8 MXU path
        off = 2 ** (spec.n_bits - 1)
        data = (codes.astype(jnp.int32) - off).astype(jnp.int8)
        zero = zero - off
        packed = False
    else:
        data, packed = codes, False
    return QuantizedTensor(
        data=data,
        scale=scale.astype(jnp.float32),
        zero=None if zero is None else zero.astype(jnp.float32),
        bits=spec.n_bits,
        group_size=spec.group_size,
        sym=zero is None,
        k=k,
        n=n,
        packed=packed,
        out_dtype=out_dtype,
        g_idx=None if g_idx is None else g_idx.astype(jnp.int32),
    )
