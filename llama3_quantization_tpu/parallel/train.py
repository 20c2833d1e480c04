"""Sharded calibration training step (the framework's "training").

The reference's only training is OmniQuant's per-block LWC/LET optimization
on one GPU (`/root/reference/quant/omniquant.py:257-293`). The TPU-native
framework generalizes it to a mesh-sharded step: model weights tensor-
parallel over `tp`, calibration batch data-parallel over `dp`, activations
optionally sequence-sharded, gradients of the LWC clipping logits psum-ed by
GSPMD, optax (AdamW) update — one jitted SPMD program.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.configs import ModelConfig
from ..models.params import linear_names
from ..models.transformer import NO_QUANT, RuntimeQuantConfig, forward_logits
from ..quant.quantizer import QuantSpec, fake_quant_dynamic, lwc_init


def init_model_lwc(params, cfg: ModelConfig, spec: QuantSpec):
    """Stacked LWC logits for every decoder linear: leaves [L, N, G, 1]."""
    lwc: Dict[str, Any] = {}
    for name in linear_names(cfg):
        w = params["layers"][name]["w"]  # [L, K, N]
        L = w.shape[0]
        single = lwc_init((w.shape[2], w.shape[1]), spec)
        lwc[name] = {
            k: jnp.broadcast_to(v, (L,) + v.shape).copy() for k, v in single.items()
        }
    return lwc


def apply_lwc_model(params, lwc, cfg: ModelConfig, spec: QuantSpec):
    """Fake-quantize all stacked decoder weights with their clipping logits
    (differentiable; one vmap over the layer axis)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in linear_names(cfg):
        entry = dict(layers[name])
        w = entry["w"]  # [L, K, N]

        def fq(w_l, up, low):
            return fake_quant_dynamic(w_l.T, spec, up, low).T.astype(w_l.dtype)

        entry["w"] = jax.vmap(fq)(w, lwc[name]["up"], lwc[name]["low"])
        layers[name] = entry
    out["layers"] = layers
    return out


def make_lwc_train_step(
    cfg: ModelConfig,
    mesh: Mesh,
    wspec: QuantSpec,
    rq: RuntimeQuantConfig = NO_QUANT,
    lr: float = 1e-2,
    seq_shard: bool = True,
):
    """Build (optimizer, jitted train_step).

    train_step(lwc, opt_state, params, tokens) -> (lwc', opt_state', loss):
    next-token CE of the LWC-fake-quantized model, grads w.r.t. the clipping
    logits only (frozen base weights — exactly the reference's optimization
    variable split, `quant/omniquant.py:257-264`).
    """
    opt = optax.adamw(lr)

    def loss_fn(lwc, params, tokens):
        eff = apply_lwc_model(params, lwc, cfg, wspec)
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        logits = forward_logits(eff, inputs, cfg, rq).astype(jnp.float32)
        if seq_shard:
            # vocab-parallel constraint on the logits: matches the Megatron
            # column-sharded lm_head's natural output sharding, so the CE
            # reductions (logsumexp, target gather) run as partial sums +
            # one all-reduce over tp and NOTHING is resharded. The previous
            # P("dp", "tp", None) (sequence over tp) conflicted with the
            # head-sharded attention einsums in the backward and forced XLA
            # into "Involuntary full rematerialization" copies (round-1
            # MULTICHIP log); sequence parallelism proper is exercised by
            # the ring-attention leg of dryrun_multichip.
            logits = jax.lax.with_sharding_constraint(
                logits, NamedSharding(mesh, P("dp", None, "tp"))
            )
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        tok = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(logz - tok)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(lwc, opt_state, params, tokens):
        tokens = jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, P("dp", None))
        )
        loss, grads = jax.value_and_grad(loss_fn)(lwc, params, tokens)
        updates, opt_state = opt.update(grads, opt_state, lwc)
        return optax.apply_updates(lwc, updates), opt_state, loss

    return opt, train_step
