"""Synthetic quantized-model construction (benchmarks without checkpoints).

This zero-egress environment cannot download Llama-3 weights, so throughput
benchmarks build models with *random packed codes + scales directly* — the
serving memory/compute profile of a real W4/W8 checkpoint without ever
materializing 16 GB of bf16 weights.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..quant.pack import pack_factor
from ..quant.qtensor import QuantizedTensor
from ..quant.quantizer import QuantSpec
from .configs import ModelConfig
from .params import linear_names


def _rand_qtensor(
    key, k: int, n: int, spec: QuantSpec, layers: int, pack: bool = True,
    percol_s8: bool = False,
):
    kd, ks, kz = jax.random.split(key, 3)
    if percol_s8:
        # serving-format weights: per-column symmetric int8 (quant/serving.py)
        data = jax.random.randint(kd, (layers, k, n), -127, 128, dtype=jnp.int32).astype(jnp.int8)
        scale = jax.random.uniform(ks, (layers, 1, n), jnp.float32, 0.5, 1.5) * (
            2.0 / jnp.sqrt(k) / 127.0
        )
        return QuantizedTensor(
            data=data, scale=scale, zero=None, bits=8, group_size=None,
            sym=True, k=k, n=n, packed=False, out_dtype=jnp.bfloat16,
        )
    gs = spec.group_size or k
    g = k // gs
    f = pack_factor(spec.n_bits) if pack else 1
    if f > 1:
        data = jax.random.randint(kd, (layers, k // f, n), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
        zero = jnp.full((layers, g, n), float(2 ** (spec.n_bits - 1)), jnp.float32)
    else:
        # unpacked storage is centered signed int8 (see quant/qtensor.py)
        half = 2 ** (spec.n_bits - 1)
        data = jax.random.randint(kd, (layers, k, n), -half, half, dtype=jnp.int32).astype(
            jnp.int8
        )
        zero = jnp.zeros((layers, g, n), jnp.float32)
    scale = (
        jax.random.uniform(ks, (layers, g, n), jnp.float32, 0.5, 1.5)
        * (2.0 / jnp.sqrt(k) / (2**spec.n_bits))
    )
    return QuantizedTensor(
        data=data,
        scale=scale,
        zero=zero,
        bits=spec.n_bits,
        group_size=spec.group_size,
        sym=False,
        k=k,
        n=n,
        packed=f > 1,
        out_dtype=jnp.bfloat16,
    )


def init_quantized_params(
    cfg: ModelConfig, spec: QuantSpec, key=None, pack: bool = True,
    dtype=jnp.bfloat16, percol_s8: bool = False, head_s8: bool = False,
    head_s4: bool = False,
):
    """Random params with all decoder linears already real-quantized.

    The whole build is one jitted program — on a remote-compile TPU
    tunnel, eager construction costs one round-trip per array (minutes for
    an 8B model); jitted it is one dispatch. `percol_s8` emits serving-
    format per-column symmetric int8 weights directly.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    return _init_jit(cfg, spec, key, pack, jnp.dtype(dtype), percol_s8, head_s8, head_s4)


@partial(jax.jit, static_argnames=("cfg", "spec", "pack", "dtype", "percol_s8", "head_s8",
                                   "head_s4"))
def _init_jit(cfg: ModelConfig, spec: QuantSpec, key, pack: bool, dtype, percol_s8=False,
              head_s8=False, head_s4=False):
    d, i, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim_
    L = cfg.num_layers
    shapes = {
        "q": (d, cfg.num_heads * hd),
        "k": (d, cfg.num_kv_heads * hd),
        "v": (d, cfg.num_kv_heads * hd),
        "o": (cfg.num_heads * hd, d),
    }
    if cfg.arch == "llama":
        shapes.update({"gate": (d, i), "up": (d, i), "down": (i, d)})
    else:
        shapes.update({"fc1": (d, i), "fc2": (i, d)})
    keys = jax.random.split(key, len(shapes) + 4)
    layers = {}
    for ki, (name, (kk, nn)) in zip(keys, shapes.items()):
        entry = {"w": _rand_qtensor(ki, kk, nn, spec, L, pack, percol_s8)}
        if cfg.arch == "opt":
            entry["b"] = jnp.zeros((L, nn), dtype)
        layers[name] = entry
    if cfg.arch == "llama":
        layers["ln1"] = {"w": jnp.ones((L, d), dtype)}
        layers["ln2"] = {"w": jnp.ones((L, d), dtype)}
    else:
        layers["ln1"] = {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)}
        if not cfg.parallel_block:
            layers["ln2"] = {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)}
    params = {
        "embed": jax.random.normal(keys[-1], (cfg.vocab_size, d), dtype) * 0.02,
        "layers": layers,
        "norm": {"w": jnp.ones((d,), dtype)}
        if cfg.arch == "llama"
        else {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }
    if cfg.arch == "opt":
        params["pos_embed"] = (
            jax.random.normal(keys[-2], (cfg.max_position_embeddings + 2, d), dtype) * 0.02
        )
    if not cfg.tie_word_embeddings:
        if head_s8 or head_s4:
            from ..quant.serving import recode_head_s4, recode_head_s8

            recode = recode_head_s4 if head_s4 else recode_head_s8
            params["lm_head"] = recode(
                jax.random.normal(keys[-3], (d, cfg.vocab_size), jnp.float32) * 0.02
            )
        else:
            params["lm_head"] = jax.random.normal(keys[-3], (d, cfg.vocab_size), dtype) * 0.02
    return params
