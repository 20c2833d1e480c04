"""IR-QLoRA — information-retention NF4 quantization (ICQ) + ICE LoRA.

Re-implements `/root/reference/irqlora.py` natively:

- **ICQ** (`search`, :63-84): per 256-block-of-64 ("block2") shift tau =
  factor·absmax + median, grid over `2·tau_n+1` factors in
  ±tau_range·sigma, picking the factor maximizing the entropy of the NF4
  nibble histogram per block (entropy of the code distribution == retained
  information). Here the whole grid is evaluated with one vmap instead of a
  python loop over factors.
- tau storage (`nf4_quant`, :40-48): dynamic-FP8 codebook codes + per-row
  absmax.
- **ICE** (`IRQLoraLinear4bit.forward`, :118-157): LoRA path augmented with
  learnable `A_scale`/`B_scale` mean/broadcast shortcuts.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .nf4 import (
    DYNAMIC_FP8_MAP,
    NF4_CODE,
    dequantize_codebook,
    quantize_to_codebook,
)

#: `sigma` constant from `irqlora.py:16`: 1/ppf of the first of
#: linspace(0.9677083, 0.5, 9)[:-1] quantiles
SIGMA = 1.0 / 1.8481308574676514


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["codes", "absmax", "tau_codes", "tau_absmax"],
    meta_fields=["shape"],
)
@dataclasses.dataclass
class ICQWeight:
    codes: jax.Array  # uint8 [n_blocks, 64] NF4 indices
    absmax: jax.Array  # f32 [n_blocks] per-64-block absmax (of shifted w)
    tau_codes: jax.Array  # uint8 [rows2, 256] FP8-map codes of tau/tau_absmax
    tau_absmax: jax.Array  # f32 [rows2] per-block2-row absmax of tau
    shape: tuple = ()


def _nf4_block_quant(w_blocks: jax.Array):
    """w_blocks [..., 64] -> (codes, absmax)."""
    absmax = jnp.max(jnp.abs(w_blocks), axis=-1, keepdims=True)
    scaled = w_blocks / jnp.clip(absmax, 1e-12, None)
    return quantize_to_codebook(scaled, NF4_CODE), absmax[..., 0]


def _block_entropy(codes: jax.Array) -> jax.Array:
    """Per-64-block entropy of the 16-symbol code histogram
    (`evaluate_entropy`, irqlora.py:50-61)."""
    onehot = jax.nn.one_hot(codes.astype(jnp.int32), 16, dtype=jnp.float32)
    freqs = jnp.mean(onehot, axis=-2)  # [..., 16]
    ent = -freqs * jnp.log2(jnp.clip(freqs, 1e-12, None))
    return jnp.sum(jnp.where(freqs > 0, ent, 0.0), axis=-1)


@partial(jax.jit, static_argnames=("tau_n", "blocksize", "blocksize2"))
def icq_search(
    w: jax.Array,
    tau_range: float = 0.1,
    tau_n: int = 51,
    blocksize: int = 64,
    blocksize2: int = 256,
) -> ICQWeight:
    """Entropy-maximizing tau search (`search`, irqlora.py:63-84)."""
    shape = w.shape
    wb = w.astype(jnp.float32).reshape(-1, blocksize2, blocksize)
    tau0 = jnp.median(wb, axis=2, keepdims=True)
    absmax0 = jnp.max(jnp.abs(wb - tau0), axis=2, keepdims=True)
    factors = jnp.linspace(-tau_range * SIGMA, tau_range * SIGMA, tau_n * 2 + 1)

    def eval_factor(factor):
        tau = factor * absmax0 + tau0
        codes, _ = _nf4_block_quant(wb - tau)
        return _block_entropy(codes)  # [rows2, 256]

    entropies = jax.vmap(eval_factor)(factors)  # [F, rows2, 256]
    best = jnp.argmax(entropies, axis=0)  # [rows2, 256]
    factor_best = factors[best][..., None]

    tau = factor_best * absmax0 + tau0
    codes, absmax = _nf4_block_quant(wb - tau)
    tau2 = jnp.max(jnp.abs(tau), axis=1, keepdims=True)  # [rows2, 1, 1]
    tau1 = quantize_to_codebook(tau / jnp.clip(tau2, 1e-12, None), DYNAMIC_FP8_MAP)
    return ICQWeight(
        codes=codes.reshape(-1, blocksize),
        absmax=absmax.reshape(-1),
        tau_codes=tau1.reshape(-1, blocksize2),
        tau_absmax=tau2.reshape(-1),
        shape=shape,
    )


@jax.jit
def icq_dequantize(q: ICQWeight) -> jax.Array:
    """NF4 dequant + tau add-back (`IRQLoraLinear4bit.forward`,
    irqlora.py:131-135)."""
    vals = jnp.take(NF4_CODE, q.codes.astype(jnp.int32))
    w = vals * q.absmax[:, None]
    tau = dequantize_codebook(q.tau_codes, DYNAMIC_FP8_MAP) * q.tau_absmax[:, None]
    blocksize2 = q.tau_codes.shape[1]
    w = w.reshape(-1, blocksize2, q.codes.shape[1]) + tau[..., None]
    return w.reshape(q.shape)


def irqlora_quantize_model(
    params,
    cfg,
    tau_range: float = 0.1,
    tau_n: int = 100,  # the reference's 201-point grid (`irqlora.py:18`)
    blocksize2: int = 256,
):
    """Model-level IR-QLoRA: every decoder linear ICQ-NF4-quantized.

    Equivalent of `replace_to_qlora_model` + `IRQLoRALMClass`
    (`/root/reference/irqlora.py:18-20`, `models/IRQLoRALMClass.py`): like
    the reference (which dequantizes NF4 inside every forward,
    irqlora.py:131-135), evaluation runs on the dequantized values — here
    dequantized once at transform time, which is numerically identical and
    avoids per-step LUT gathers. LoRA adapters start at zero (`lora_b=0`),
    matching a freshly-attached PEFT adapter before finetuning.
    """
    from ..models.params import linear_names

    out = dict(params)
    layers = dict(params["layers"])
    for name in linear_names(cfg):
        entry = dict(layers[name])
        w = entry["w"]  # [L, K, N]

        def q_one(w_l):
            numel = w_l.size
            if numel % (blocksize2 * 64):
                return w_l  # shape not blockable; keep fp (reference skips)
            q = icq_search(w_l.reshape(-1), tau_range=tau_range, tau_n=tau_n,
                           blocksize2=blocksize2)
            q = ICQWeight(q.codes, q.absmax, q.tau_codes, q.tau_absmax, w_l.shape)
            return icq_dequantize(q).astype(w_l.dtype)

        entry["w"] = jax.vmap(q_one)(w)
        layers[name] = entry
    if cfg.is_moe:
        # expert stacks [L, E, K, N]: ICQ per expert weight
        from ..models.params import MOE_EXPERT_LINEARS

        experts = dict(layers["experts"])
        for name in MOE_EXPERT_LINEARS:
            entry = dict(experts[name])
            w = entry["w"]

            def q_expert(w_l):
                numel = w_l.size
                if numel % (blocksize2 * 64):
                    return w_l
                q = icq_search(w_l.reshape(-1), tau_range=tau_range, tau_n=tau_n,
                               blocksize2=blocksize2)
                q = ICQWeight(q.codes, q.absmax, q.tau_codes, q.tau_absmax, w_l.shape)
                return icq_dequantize(q).astype(w_l.dtype)

            entry["w"] = jax.vmap(jax.vmap(q_expert))(w)
            experts[name] = entry
        layers["experts"] = experts
    out["layers"] = layers
    return out


def ice_lora_apply(
    x: jax.Array,
    w_icq: ICQWeight,
    lora_a: jax.Array,  # [K, r]
    lora_b: jax.Array,  # [r, N]
    a_scale: jax.Array,  # scalar (learned, init 0)
    b_scale: jax.Array,  # scalar
    scaling: float = 1.0,
) -> jax.Array:
    """Base NF4 linear + ICE-augmented LoRA path (irqlora.py:136-155).

    ICE: h = A(x) + a_scale * mean-pool(x -> r); out = B(h) + b_scale *
    broadcast(h -> N), matching the reference's reshape-mean / unsqueeze
    shortcuts.
    """
    w = icq_dequantize(w_icq).astype(x.dtype)
    base = x @ w
    r = lora_a.shape[1]
    k = x.shape[-1]
    h = x @ lora_a + a_scale * x.reshape(*x.shape[:-1], r, -1).mean(-1)
    n = lora_b.shape[1]
    out = h @ lora_b
    rep = n // r
    ice_b = jnp.repeat(h, rep, axis=-1)
    if ice_b.shape[-1] != n:
        ice_b = jnp.pad(ice_b, [(0, 0)] * (ice_b.ndim - 1) + [(0, n - ice_b.shape[-1])])
    return base + scaling * (out + b_scale * ice_b)
