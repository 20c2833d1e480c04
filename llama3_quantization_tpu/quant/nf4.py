"""NF4 codebook quantization + double-quantized statistics.

TPU-native equivalent of the bitsandbytes NF4/FP8 kernels IR-QLoRA depends
on (`/root/reference/irqlora.py:6-12,25-48`; SURVEY.md §2.6 item 2):
block-64 normal-float-4 codebook quantization with per-block absmax, the
absmax itself optionally double-quantized (dynamic-FP8 codebook + per-256
group scale). Pure JAX: the 16-entry LUT dequant is a `jnp.take` gather
which XLA lowers to an efficient one-hot matmul / gather on TPU.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

#: the QLoRA NF4 data type: quantiles of N(0,1) normalized to [-1, 1]
NF4_CODE = jnp.asarray(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=jnp.float32,
)


def make_dynamic_map(signed: bool = True, max_exponent_bits: int = 7, total_bits: int = 8):
    """bitsandbytes' dynamic 8-bit codebook (`create_dynamic_map`) used to
    store IR-QLoRA's tau (`irqlora.py:25,47`).

    Deliberate divergence: upstream's unsigned branch doubles the fraction
    items per exponent decade, which yields ~2**(total_bits+1) entries and
    can never fit the code space. Here the freed sign bit instead buys one
    extra fraction bit with the additional-items block shrunk to
    compensate, giving exactly 2**total_bits entries."""
    data = []
    non_sign_bits = total_bits - (1 if signed else 0)
    additional_exp = non_sign_bits - max_exponent_bits - (0 if signed else 1)
    additional_items = 2**additional_exp - 1 if additional_exp >= 0 else 0
    for i in range(max_exponent_bits):
        fraction_items = int(2 ** (i + non_sign_bits - max_exponent_bits) + 1)
        boundaries = np.linspace(0.1, 1, fraction_items)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += ((10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()
        if signed:
            data += (-(10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()
    if additional_items > 0:
        boundaries = np.linspace(0.1, 1, additional_items + 1)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += ((10 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1)) * means).tolist()
        if signed:
            data += (
                -(10 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1)) * means
            ).tolist()
    data.append(0)
    data.append(1.0)
    data.sort()
    if len(data) > 2**total_bits:
        raise ValueError(
            f"dynamic map has {len(data)} entries > {2**total_bits} codes; "
            "reduce max_exponent_bits (unsigned maps need more fraction space)"
        )
    return jnp.asarray(data, dtype=jnp.float32)


DYNAMIC_FP8_MAP = make_dynamic_map()


def quantize_to_codebook(x: jax.Array, code: jax.Array) -> jax.Array:
    """Nearest-codebook-entry indices (`irqlora.py:26-34`)."""
    diff = jnp.abs(x[..., None] - code)
    return jnp.argmin(diff, axis=-1).astype(jnp.uint8)


def dequantize_codebook(idx: jax.Array, code: jax.Array) -> jax.Array:
    return jnp.take(code, idx.astype(jnp.int32))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["packed", "absmax", "absmax_scale", "absmax_mean"],
    meta_fields=["shape", "block_size"],
)
@dataclasses.dataclass
class NF4Tensor:
    """Block-quantized NF4 weight: codes packed 2/byte along flattened
    elements; absmax per block (optionally double-quantized)."""

    packed: jax.Array  # uint8 [numel/2]
    absmax: jax.Array  # f32 [nblocks]  (or int8 codes when double-quantized)
    absmax_scale: Optional[jax.Array]  # f32 [nblocks/256] when double-quantized
    absmax_mean: Optional[jax.Array]  # f32 [] per-tensor offset (double quant)
    shape: tuple = ()
    block_size: int = 64


@partial(jax.jit, static_argnames=("block_size", "double_quant"))
def nf4_quantize(w: jax.Array, block_size: int = 64, double_quant: bool = True) -> NF4Tensor:
    # pad to whole blocks (bnb pads too); dequant slices back to w.size
    flat1 = w.astype(jnp.float32).reshape(-1)
    pad = (-flat1.shape[0]) % block_size
    if pad:
        flat1 = jnp.concatenate([flat1, jnp.zeros(pad, jnp.float32)])
    flat = flat1.reshape(-1, block_size)
    absmax = jnp.max(jnp.abs(flat), axis=1)
    scaled = flat / jnp.clip(absmax[:, None], 1e-12, None)
    codes = quantize_to_codebook(scaled, NF4_CODE).reshape(-1)
    packed = (codes[0::2] << 4) | codes[1::2]
    if double_quant:
        # bnb-style: offset by mean, 8-bit dynamic-map code + per-256 absmax
        amean = jnp.mean(absmax)
        centered = absmax - amean
        gsize = min(256, centered.shape[0])
        gpad = (-centered.shape[0]) % gsize
        if gpad:
            centered = jnp.concatenate([centered, jnp.zeros(gpad, jnp.float32)])
        g = centered.reshape(-1, gsize)
        gmax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
        acodes = quantize_to_codebook(g / jnp.clip(gmax, 1e-12, None), DYNAMIC_FP8_MAP)
        return NF4Tensor(packed, acodes.reshape(-1), gmax[:, 0], amean, w.shape, block_size)
    return NF4Tensor(packed, absmax, None, None, w.shape, block_size)


@jax.jit
def nf4_dequantize(t: NF4Tensor) -> jax.Array:
    hi = (t.packed >> 4).astype(jnp.int32)
    lo = (t.packed & 0xF).astype(jnp.int32)
    codes = jnp.stack([hi, lo], axis=1).reshape(-1)
    vals = jnp.take(NF4_CODE, codes)
    if t.absmax_scale is not None:
        g = t.absmax.reshape(t.absmax_scale.shape[0], -1)
        absmax = (
            dequantize_codebook(g, DYNAMIC_FP8_MAP) * t.absmax_scale[:, None]
        ).reshape(-1) + t.absmax_mean
    else:
        absmax = t.absmax
    blocks = vals.reshape(-1, t.block_size)
    out = blocks * absmax[: blocks.shape[0], None]
    numel = 1
    for d in t.shape:
        numel *= d
    return out.reshape(-1)[:numel].reshape(t.shape)


def nf4_codes(t: NF4Tensor) -> jax.Array:
    """Unpacked 4-bit code stream (for entropy evaluation)."""
    hi = (t.packed >> 4).astype(jnp.int32)
    lo = (t.packed & 0xF).astype(jnp.int32)
    return jnp.stack([hi, lo], axis=1).reshape(-1)
