"""GPipe-style pipeline parallelism over a `pp` mesh axis.

The reference's "pipeline" is single-process layer *placement* with forward
pre-hooks shipping activations over PCIe (`/root/reference/
parallel_utils.py:89-163`, `llama.py:350-406` MoveModule) — no scheduling,
one sample in flight. The TPU-native replacement is SPMD: the stacked layer
pytree is sharded on its layer axis across the `pp` mesh axis, and one
jitted `shard_map` program runs the classic GPipe schedule — M microbatches
flow through P stages in M + P - 1 ticks, with `ppermute` carrying
activations stage-to-stage over ICI.

Every stage executes the same program every tick (SPMD); bubble ticks
compute on zero-filled buffers and their writes are masked out. Weights
stay resident (each device holds L/P layers); activations are the only
traffic, one [mb, S, D] block per tick per boundary.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.configs import ModelConfig
from ..models.transformer import (
    NO_QUANT,
    RuntimeQuantConfig,
    causal_mask,
    decoder_layer,
    embed,
    final_norm,
    lm_head,
    rope_cos_sin,
)


def pipeline_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs for pipeline sharding: decoder-layer stacks split on
    their leading (layer) axis over `pp`; embeddings/norms/head replicated
    (they run on every stage, only the masked writes differ)."""

    def layer_leaf(x):
        return P("pp", *([None] * (x.ndim - 1)))

    def repl_leaf(x):
        return P(*([None] * x.ndim))

    specs = {
        k: jax.tree_util.tree_map(repl_leaf, v)
        for k, v in params.items()
        if k != "layers"
    }
    specs["layers"] = jax.tree_util.tree_map(layer_leaf, params["layers"])
    return specs


def shard_params_pipeline(params, mesh: Mesh, cfg: ModelConfig):
    """Place params for `make_pipeline_forward` (layer axis over `pp`)."""
    specs = pipeline_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_pipeline_forward(
    cfg: ModelConfig,
    mesh: Mesh,
    n_microbatches: int,
    rq: RuntimeQuantConfig = NO_QUANT,
):
    """jitted `fn(params, tokens) -> logits` running the GPipe schedule.

    Requirements: `cfg.num_layers % pp == 0`, `batch % n_microbatches == 0`.
    """
    pp = mesh.shape["pp"]
    if cfg.num_layers % pp:
        raise ValueError(f"num_layers={cfg.num_layers} not divisible by pp={pp}")
    param_specs_fn = pipeline_pspecs

    def pipelined(params, tokens):  # runs per-device under shard_map
        stage = jax.lax.axis_index("pp")
        m = n_microbatches
        b, s = tokens.shape
        mb = b // m
        positions = jnp.arange(s)[None, :]
        h = embed(params, tokens, cfg, positions)  # [B, S, D] (replicated)
        h_mb = h.reshape(m, mb, s, -1)
        cos_sin = (
            rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, h.dtype, cfg.rope_scaling_)
            if cfg.uses_rope
            else None
        )
        mask = causal_mask(s)

        def run_stage(x):
            def body(hc, layer_p):
                hc, _ = decoder_layer(layer_p, hc, cfg, rq, cos_sin, mask)
                return hc, None

            out, _ = jax.lax.scan(body, x, params["layers"])  # local L/pp slab
            return out

        perm = [(i, (i + 1) % pp) for i in range(pp)]

        def tick(t, carry):
            state, outputs = carry
            # stage 0 consumes microbatch t; later stages consume the
            # activation ppermuted in at the previous tick
            inp = jnp.where(
                stage == 0, h_mb[jnp.clip(t, 0, m - 1)], state
            )
            out = run_stage(inp)
            # the LAST stage's output at tick t is microbatch t-(pp-1)
            out_idx = t - (pp - 1)
            idx = jnp.clip(out_idx, 0, m - 1)
            write = jnp.logical_and(stage == pp - 1, out_idx >= 0)
            old = jax.lax.dynamic_slice_in_dim(outputs, idx, 1, axis=0)
            new = jnp.where(write, out[None], old)
            outputs = jax.lax.dynamic_update_slice_in_dim(outputs, new, idx, axis=0)
            state = jax.lax.ppermute(out, "pp", perm)
            return state, outputs

        state0 = jnp.zeros((mb, s, h.shape[-1]), h.dtype)
        outputs0 = jnp.zeros_like(h_mb)
        _, outputs = jax.lax.fori_loop(0, m + pp - 1, tick, (state0, outputs0))

        # completed hidden states live on the last stage; broadcast them
        hidden = jax.lax.psum(
            jnp.where(stage == pp - 1, outputs, jnp.zeros_like(outputs)), "pp"
        )
        hidden = hidden.reshape(b, s, -1)
        return lm_head(params, final_norm(params, hidden, cfg), cfg)

    @jax.jit
    def fwd(params, tokens):
        specs = param_specs_fn(params)
        inner = shard_map(
            pipelined,
            mesh=mesh,
            in_specs=(specs, P(None, None)),
            out_specs=P(None, None, None),
            check_vma=False,
        )
        return inner(params, tokens)

    return fwd
