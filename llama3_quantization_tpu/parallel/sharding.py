"""Parameter PartitionSpecs and sharded execution helpers.

Megatron-style tensor parallelism for the transformer linears:
- column-parallel (output-feature sharded on `tp`): q/k/v, gate/up, fc1
- row-parallel (input-feature sharded on `tp`):     o, down, fc2
so each attention+MLP pair needs exactly one all-reduce, which XLA inserts
from the shardings. Quantized weights shard the same axes; grouped scales /
zeros shard congruently (group axis follows the contraction axis).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.configs import ModelConfig
from ..quant.qtensor import QuantizedTensor

#: per-linear shard axis: "col" shards the output (N) axis, "row" the input
#: (K) axis of the [K, N] weight.
_LINEAR_KIND = {
    "q": "col",
    "k": "col",
    "v": "col",
    "o": "row",
    "gate": "col",
    "up": "col",
    "down": "row",
    "fc1": "col",
    "fc2": "row",
}


def _weight_spec(value, kind: str, stacked: bool, n_lead: int = None):
    """Spec for one linear weight (array or QuantizedTensor), with leading
    stack axes (layer / expert — never sharded)."""
    if n_lead is None:
        n_lead = 1 if stacked else 0
    lead = (None,) * n_lead
    if isinstance(value, QuantizedTensor):
        if kind == "col":
            data = P(*lead, None, "tp")
            scale = P(*lead, None, "tp")
        else:  # row: K axis sharded -> packed data axis 0 and group axis shard
            data = P(*lead, "tp", None)
            # per-column scales (one group along K, e.g. serving recode)
            # don't follow the K shard — replicate them
            g_axis = n_lead  # first axis after the stack lead
            scale = (
                P(*lead, None, None)
                if value.scale.shape[g_axis] == 1
                else P(*lead, "tp", None)
            )
        return QuantizedTensor(
            data=data,
            scale=scale,
            zero=None if value.zero is None else scale,
            bits=value.bits,
            group_size=value.group_size,
            sym=value.sym,
            k=value.k,
            n=value.n,
            packed=value.packed,
            out_dtype=value.out_dtype,
        )
    if kind == "col":
        return P(*lead, None, "tp")
    return P(*lead, "tp", None)


def _bias_spec(kind: str, stacked: bool):
    lead = (None,) if stacked else ()
    return P(*lead, "tp") if kind == "col" else P(*lead, None)


def model_pspecs(
    params: Dict[str, Any], cfg: ModelConfig, expert_parallel: bool = False
) -> Dict[str, Any]:
    """Same-structure pytree of PartitionSpecs for a model param pytree.

    `expert_parallel` shards MoE expert stacks on their expert axis over
    `tp` (EP) instead of sharding each expert's features (TP)."""
    specs: Dict[str, Any] = {}
    specs["embed"] = P(None, None)  # replicated (gathered once per step)
    if "pos_embed" in params:
        specs["pos_embed"] = P(None, None)
    if "lm_head" in params:
        # plain array OR serving-recoded QuantizedTensor (column-parallel)
        specs["lm_head"] = _weight_spec(params["lm_head"], "col", stacked=False)
    specs["norm"] = {k: P(None) for k in params["norm"]}
    layer_specs: Dict[str, Any] = {}
    for name, entry in params["layers"].items():
        if name == "router":  # MoE router: small, replicated, fp
            layer_specs[name] = {"w": P(None, None, None)}
        elif name == "experts":  # MoE experts: [L, E, K, N]
            if expert_parallel:
                # EP: whole experts live on different devices
                def espec(eentry):
                    w = eentry["w"]
                    if isinstance(w, QuantizedTensor):
                        s = P(None, "tp", None, None)
                        return QuantizedTensor(
                            data=s, scale=s, zero=None if w.zero is None else s,
                            bits=w.bits, group_size=w.group_size, sym=w.sym,
                            k=w.k, n=w.n, packed=w.packed, out_dtype=w.out_dtype,
                        )
                    return P(None, "tp", None, None)

                layer_specs[name] = {
                    ename: {"w": espec(eentry)} for ename, eentry in entry.items()
                }
            else:
                layer_specs[name] = {
                    ename: {
                        "w": _weight_spec(
                            eentry["w"], _LINEAR_KIND[ename], stacked=True, n_lead=2
                        )
                    }
                    for ename, eentry in entry.items()
                }
        elif name in _LINEAR_KIND:
            kind = _LINEAR_KIND[name]
            e: Dict[str, Any] = {"w": _weight_spec(entry["w"], kind, stacked=True)}
            if "b" in entry:
                e["b"] = _bias_spec(kind, stacked=True)
            layer_specs[name] = e
        else:  # norms: [L, D] (+ bias)
            layer_specs[name] = {k: P(None, None) for k in entry}
    specs["layers"] = layer_specs
    return specs


def shard_params(params, mesh: Mesh, cfg: ModelConfig, expert_parallel: bool = False):
    """Place a param pytree onto the mesh per `model_pspecs`."""
    specs = model_pspecs(params, cfg, expert_parallel=expert_parallel)
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s, _ = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    placed = [
        jax.device_put(p, NamedSharding(mesh, s)) for p, s in zip(flat_p, flat_s)
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def kv_cache_pspecs(cache):
    """KV cache [L, B, Hkv, T, D] (heads-major): batch on dp, kv-heads on tp."""
    return {k: P(None, "dp", "tp", None, None) for k in cache}


def make_sharded_forward(cfg: ModelConfig, mesh: Mesh, rq=None):
    """jitted logits fn with dp-sharded batch and tp-sharded weights."""
    from ..models.transformer import NO_QUANT, forward_logits

    rq = rq or NO_QUANT

    @jax.jit
    def fwd(params, tokens):
        tokens = jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, P("dp", None))
        )
        logits = forward_logits(params, tokens, cfg, rq)
        return jax.lax.with_sharding_constraint(
            logits, NamedSharding(mesh, P("dp", None, "tp"))
        )

    return fwd


#: seq2seq (T5) linear kinds: column-parallel projections, row-parallel
#: output/down projections — one all-reduce per attention / cross-attention
#: / MLP block, exactly the Megatron recipe of `_LINEAR_KIND`
_SEQ2SEQ_KIND = {
    "q": "col", "k": "col", "v": "col", "o": "row",
    "cq": "col", "ck": "col", "cv": "col", "co": "row",
    "wi": "col", "wi0": "col", "wi1": "col", "wo": "row",
}


def seq2seq_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs for a `models/seq2seq.py` param pytree (round 4):
    tensor parallelism over `tp` for every encoder/decoder linear
    (fp arrays or QuantizedTensor leaves), everything else replicated.
    Requires num_heads % tp == 0 (head groups follow the sharded inner
    axis) and d_ff % tp == 0."""
    def side(layers):
        out = {}
        for name, w in layers.items():
            if name.startswith("ln"):
                out[name] = P(None, None)
            else:
                out[name] = _weight_spec(w, _SEQ2SEQ_KIND[name], stacked=True)
        return {"layers": out}

    specs: Dict[str, Any] = {
        "shared": P(None, None),
        "enc": side(params["enc"]["layers"]),
        "dec": side(params["dec"]["layers"]),
        "enc_ln": P(None),
        "dec_ln": P(None),
        "enc_rel": P(None, None),
        "dec_rel": P(None, None),
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, "tp")
    return specs


def shard_params_seq2seq(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a seq2seq param pytree on the mesh per `seq2seq_pspecs`."""
    specs = seq2seq_pspecs(params)
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s, _ = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    placed = [
        jax.device_put(p, NamedSharding(mesh, s)) for p, s in zip(flat_p, flat_s)
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)
