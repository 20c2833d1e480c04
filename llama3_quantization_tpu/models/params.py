"""Parameter pytree construction: random init and model-level transforms.

The reference mutates HF modules in place to quantize
(`/root/reference/quant/omniquant.py:296-298`); here quantization is a pure
function `params -> params` that replaces selected linear weights with
`QuantizedTensor`s.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..quant.qtensor import QuantizedTensor, quantize_rtn
from ..quant.quantizer import QuantSpec
from .configs import ModelConfig

Params = Dict[str, Any]

#: linear param names per arch (order = canonical traversal order; matches
#: the reference's per-layer named_linears, `quant/omniquant.py:170-186`)
LLAMA_LINEARS = ("q", "k", "v", "o", "gate", "up", "down")
OPT_LINEARS = ("q", "k", "v", "o", "fc1", "fc2")
MOE_ATTN_LINEARS = ("q", "k", "v", "o")  # experts handled separately
MOE_EXPERT_LINEARS = ("gate", "up", "down")


def linear_names(cfg: ModelConfig):
    if cfg.is_moe:
        return MOE_ATTN_LINEARS
    return LLAMA_LINEARS if cfg.arch == "llama" else OPT_LINEARS


def init_params(cfg: ModelConfig, key: jax.Array, dtype=None) -> Params:
    """Random-init parameters (tiny-model tests and synthetic benchmarks).

    Scaled-normal init; shapes identical to the HF checkpoints the loader
    produces, with all linear weights stored `[in, out]`.
    """
    dtype = dtype or jnp.dtype(cfg.dtype)
    d, i, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim_
    nh, nkv, L = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
    keys = iter(jax.random.split(key, 32))

    def w(shape, scale=None):
        scale = scale or (1.0 / jnp.sqrt(shape[0]))
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    def stack(f):
        """Init one leading-axis-stacked tensor for all layers."""
        ks = jax.random.split(next(keys), L)
        return jax.vmap(lambda k: f(k))(ks)

    def lin(key, shape):
        scale = 1.0 / jnp.sqrt(shape[0])
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    if cfg.is_moe:
        layer_shapes = {
            "q": (d, nh * hd),
            "k": (d, nkv * hd),
            "v": (d, nkv * hd),
            "o": (nh * hd, d),
        }
    elif cfg.arch == "llama":
        layer_shapes = {
            "q": (d, nh * hd),
            "k": (d, nkv * hd),
            "v": (d, nkv * hd),
            "o": (nh * hd, d),
            "gate": (d, i),
            "up": (d, i),
            "down": (i, d),
        }
    else:
        layer_shapes = {
            "q": (d, nh * hd),
            "k": (d, nkv * hd),
            "v": (d, nkv * hd),
            "o": (nh * hd, d),
            "fc1": (d, i),
            "fc2": (i, d),
        }

    layers: Params = {}
    for name, shape in layer_shapes.items():
        ks = jax.random.split(next(keys), L)
        entry = {"w": jax.vmap(lambda k: lin(k, shape))(ks)}
        if cfg.arch == "opt":  # OPT linears carry biases
            entry["b"] = jnp.zeros((L, shape[1]), dtype)
        layers[name] = entry
    if cfg.is_moe:
        # router fp (reference excludes the gate from quantization,
        # quant/omniquant.py:198-206) + stacked experts [L, E, K, N]
        e = cfg.num_experts
        keys2 = jax.random.split(next(keys), 4)
        layers["router"] = {
            "w": jax.random.normal(keys2[0], (L, d, e), jnp.float32).astype(dtype)
            / jnp.sqrt(d).astype(dtype)
        }
        def expert_stack(kk, shape):
            ks = jax.random.split(kk, L * e)
            return jax.vmap(lambda k: lin(k, shape))(ks).reshape(L, e, *shape)
        layers["experts"] = {
            "gate": {"w": expert_stack(keys2[1], (d, i))},
            "up": {"w": expert_stack(keys2[2], (d, i))},
            "down": {"w": expert_stack(keys2[3], (i, d))},
        }
    if cfg.rms_norms:
        layers["ln1"] = {"w": jnp.ones((L, d), dtype)}
        layers["ln2"] = {"w": jnp.ones((L, d), dtype)}
    else:
        layers["ln1"] = {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)}
        if not cfg.parallel_block:  # Falcon's parallel block has one shared LN
            layers["ln2"] = {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)}

    params: Params = {
        "embed": w((cfg.vocab_size, d), scale=0.02),
        "layers": layers,
        "norm": {"w": jnp.ones((d,), dtype)}
        if cfg.rms_norms
        else {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }
    if cfg.arch == "opt":
        params["pos_embed"] = w((cfg.max_position_embeddings + 2, d), scale=0.02)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w((d, cfg.vocab_size), scale=0.02)
    return params


def quantize_model_rtn(
    params: Params,
    cfg: ModelConfig,
    weight_spec: QuantSpec,
    pack: bool = False,
    skip: Optional[Callable[[str], bool]] = None,
) -> Params:
    """RTN-quantize every decoder-layer linear weight (the reference's
    `--epochs 0` / plain RTN path, `quant/omniquant.py` with no training).

    Embeddings, norms, and lm_head stay full precision, matching the
    reference which only wraps decoder-layer Linears
    (`quant/omniquant.py:170-186`).

    Weights are stacked `[L, K, N]`; each layer is quantized independently
    via vmap (scales per layer), which preserves per-layer numerics while
    keeping one fused compile. n_bits >= 16 is a no-op (the reference's
    disabled-quantizer passthrough).
    """
    if not weight_spec.enabled:
        return params
    out = dict(params)
    layers = dict(params["layers"])
    for name in linear_names(cfg):
        if skip and skip(name):
            continue
        entry = dict(layers[name])
        stacked = entry["w"]  # [L, K, N]

        def q_one(w):
            return quantize_rtn(w, weight_spec, pack=pack)

        entry["w"] = jax.vmap(q_one)(stacked)
        layers[name] = entry
    if cfg.is_moe:
        # experts [L, E, K, N]: quantize each expert independently (router
        # stays fp, matching the reference's gate exclusion)
        experts = dict(layers["experts"])
        for name in MOE_EXPERT_LINEARS:
            entry = dict(experts[name])

            def q_one_e(w):
                return quantize_rtn(w, weight_spec, pack=pack)

            entry["w"] = jax.vmap(jax.vmap(q_one_e))(entry["w"])
            experts[name] = entry
        layers["experts"] = experts
    out["layers"] = layers
    return out
