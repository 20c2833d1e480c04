"""Megatron-style sequence-parallel TP forward with overlapped collectives.

GSPMD's TP forward (`sharding.make_sharded_forward`) lets XLA insert
monolithic all-reduces. This module is the explicit alternative: the
Megatron sequence-parallel block structure — activations sequence-sharded
between blocks, heads/feature-sharded inside them — with BOTH brackets
expressed as the ring collective matmuls of `collective_matmul.py`:

    h[S/P]  ──ag_matmul──►  qkv / gate·up (column shards, full S)
            ◄──rs_matmul──  o / down (row shards, reduced + re-scattered)

so every ICI transfer rides a ring step that overlaps the MXU work on the
chunk already resident (SURVEY.md §7.7's "collectives overlapped with the
quantized matmuls"). Pre-norm RoPE architectures; requires
`num_heads % tp == num_kv_heads % tp == 0` and `S % tp == 0`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.configs import ModelConfig
from ..models.transformer import (
    NO_QUANT,
    RuntimeQuantConfig,
    _attention,
    _norm,
    causal_mask,
    lm_head,
    rope_cos_sin,
)
from .collective_matmul import ag_matmul, rs_matmul

#: per-layer weight axes for the shard_map in_specs: columns for the
#: block-entry projections, rows for the block-exit ones
_COL = ("q", "k", "v", "gate", "up")
_ROW = ("o", "down")


def tp_overlap_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    from ..quant.qtensor import QuantizedTensor

    def array_spec(name, ndim):
        if name in _COL:
            return P(*([None] * (ndim - 1)), "tp")
        if name in _ROW:
            return P(*([None] * (ndim - 2)), "tp", None)
        return P(*([None] * ndim))

    def leaf(path_names, x):
        name = path_names[-2] if len(path_names) >= 2 else None
        if isinstance(x, QuantizedTensor):
            # data/scale/zero all stack as [L, rows, N]; shard congruently
            return jax.tree_util.tree_map(
                lambda a: array_spec(name, a.ndim), x
            )
        return array_spec(name, x.ndim)

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return leaf(path, tree)

    return walk(params)


def make_tp_overlap_forward(
    cfg: ModelConfig, mesh: Mesh, rq: RuntimeQuantConfig = NO_QUANT
):
    """jitted `fn(params, tokens) -> logits` running the sequence-parallel
    TP schedule with ring-overlapped collectives."""
    if cfg.parallel_block or not cfg.uses_rope or cfg.is_moe:
        raise NotImplementedError("tp-overlap forward supports dense pre-norm RoPE archs")
    tp = mesh.shape["tp"]
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        raise ValueError(f"head counts must divide tp={tp}")

    hd = cfg.head_dim_
    h_loc = cfg.num_heads // tp
    hkv_loc = cfg.num_kv_heads // tp

    def _flat(x):  # [B, S_loc, D] -> [S_loc*B, D], S-major rows
        return jnp.swapaxes(x, 0, 1).reshape(-1, x.shape[-1])

    def _unflat(y, b):  # S-major rows -> [B, S, N]
        s = y.shape[0] // b
        return jnp.swapaxes(y.reshape(s, b, y.shape[-1]), 0, 1)

    def trunk(params, tokens):
        my = jax.lax.axis_index("tp")
        b, s = tokens.shape
        s_loc = s // tp
        h_full = jnp.take(params["embed"], tokens, axis=0, mode="clip")
        h = jax.lax.dynamic_slice_in_dim(h_full, my * s_loc, s_loc, axis=1)
        positions = jnp.arange(s)[None, :]
        cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta, h_full.dtype, cfg.rope_scaling_)
        mask = causal_mask(s)
        from ..models.transformer import apply_rope

        def body(hc, p):
            # --- attention: ag into column-sharded qkv, rs out of o ---
            x = _flat(_norm(p["ln1"], hc, cfg))
            qf = ag_matmul(x, p["q"]["w"])  # [S*B, h_loc*hd]
            kf = ag_matmul(x, p["k"]["w"])
            vf = ag_matmul(x, p["v"]["w"])
            q = _unflat(qf, b).reshape(b, s, h_loc, hd)
            k = _unflat(kf, b).reshape(b, s, hkv_loc, hd)
            v = _unflat(vf, b).reshape(b, s, hkv_loc, hd)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn = _attention(q, k, v, mask, cfg, rq)  # local heads, full S
            of = rs_matmul(_flat(attn.reshape(b, s, h_loc * hd)), p["o"]["w"])
            hc = hc + _unflat(of, b)
            # --- MLP: ag into gate/up shards, rs out of down ---
            x2 = _flat(_norm(p["ln2"], hc, cfg))
            gate = _unflat(ag_matmul(x2, p["gate"]["w"]), b)
            up = _unflat(ag_matmul(x2, p["up"]["w"]), b)
            act = jax.nn.silu(gate) * up  # [B, S, I/P]
            df = rs_matmul(_flat(act), p["down"]["w"])
            return hc + _unflat(df, b), None

        h, _ = jax.lax.scan(body, h, params["layers"])
        h = jax.lax.all_gather(h, "tp", axis=1, tiled=True)  # back to full S
        h = _norm(params["norm"], h, cfg)
        return lm_head(params, h, cfg)

    @jax.jit
    def fwd(params, tokens):
        inner = shard_map(
            trunk,
            mesh=mesh,
            in_specs=(tp_overlap_pspecs(params), P(None, None)),
            out_specs=P(None, None, None),
            check_vma=False,
        )
        return inner(params, tokens)

    return fwd
