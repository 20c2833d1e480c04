"""OmniQuant — learnable weight clipping (LWC) block calibration.

Re-implements the reference's only in-repo calibration optimizer
(`/root/reference/quant/omniquant.py:195-338`): per decoder layer, train
sigmoid-bounded clipping factors so the fake-quantized layer's output
matches the fp layer's output in MSE, then bake the learned clipping into a
real-quantized weight and propagate quantized activations to the next layer.

TPU-first differences from the reference:
- the whole block-training step (LWC fold -> fake-quant -> layer forward ->
  MSE -> grads -> optax update) is ONE jitted function; no AMP grad scaler
  is needed because bf16 params keep fp32 master copies in optax and the
  loss is computed in fp32 (reference needs `NativeScalerWithGradNormCount`,
  `utils.py:27-53`);
- dual streams (`fp_inps` target / `quant_inps` input) are two device
  arrays, not hook-captured module state.

LET (learnable equivalent transformation) is initialized via the
SmoothQuant fold (`smoothquant.py`) and, in this version, kept fixed during
block training; the learned component is LWC. Joint LET+LWC training is a
planned extension (`let_lr` is accepted and currently ignored).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.configs import ModelConfig
from ..models.params import linear_names
from ..models.transformer import NO_QUANT, RuntimeQuantConfig, decoder_layer
from .calibration import _layer_slice, _stack_layers, embed_calibration
from .qtensor import quantize_rtn
from .quantizer import QuantSpec, fake_quant_dynamic, lwc_init


@dataclasses.dataclass(frozen=True)
class OmniConfig:
    wspec: QuantSpec = QuantSpec(n_bits=4, group_size=128, lwc=True)
    epochs: int = 5
    lwc_lr: float = 1e-2
    let_lr: float = 5e-3  # reserved for joint LET training
    weight_decay: float = 0.0
    batch_size: int = 2
    aug_loss: bool = False
    pack: bool = False

    def __post_init__(self):
        if not self.wspec.lwc:
            object.__setattr__(self, "wspec", dataclasses.replace(self.wspec, lwc=True))


def init_layer_lwc(p_l: Dict[str, Any], cfg: ModelConfig, spec: QuantSpec):
    """Clipping logits for every linear of one layer (reference inits at 4.0
    so sigmoid≈0.98 ~ no clipping, `quant/quantizer.py:68`)."""
    return {
        name: lwc_init(p_l[name]["w"].T.shape, spec) for name in linear_names(cfg)
    }


def apply_lwc(p_l, lwc, cfg: ModelConfig, spec: QuantSpec):
    """Effective layer params: weights fake-quantized with the current
    clipping logits (the reference's `smooth_and_quant_temporary`,
    `quant/utils.py:62-101`, LWC part)."""
    eff = dict(p_l)
    for name in linear_names(cfg):
        entry = dict(eff[name])
        w = entry["w"]
        wq = fake_quant_dynamic(w.T, spec, lwc[name]["up"], lwc[name]["low"]).T
        entry["w"] = wq.astype(w.dtype)
        eff[name] = entry
    return eff


def omniquant_model(
    params,
    cfg: ModelConfig,
    calib_tokens: np.ndarray,
    ocfg: OmniConfig = OmniConfig(),
    rq: RuntimeQuantConfig = NO_QUANT,
    progress: Optional[Callable[[int, int, float], None]] = None,
):
    """Blockwise LWC calibration over all layers; returns real-quantized
    params. With `epochs=0` this reduces to plain RTN (the reference's
    degenerate path, SURVEY.md §2.2)."""
    tokens = jnp.asarray(calib_tokens, jnp.int32)
    n = tokens.shape[0]
    bs = min(ocfg.batch_size, n)
    h_fp, cos_sin, mask = embed_calibration(params, cfg, tokens)
    h_q = h_fp

    run_fp = jax.jit(lambda p, hb: decoder_layer(p, hb, cfg, NO_QUANT, cos_sin, mask)[0])
    run_q = jax.jit(lambda p, hb: decoder_layer(p, hb, cfg, rq, cos_sin, mask)[0])

    opt = optax.adamw(ocfg.lwc_lr, weight_decay=ocfg.weight_decay)

    def loss_fn(lwc, p_l, hq_b, target_b, hfp_b):
        eff = apply_lwc(p_l, lwc, cfg, ocfg.wspec)
        out = decoder_layer(eff, hq_b, cfg, rq, cos_sin, mask)[0]
        loss = jnp.mean((out.astype(jnp.float32) - target_b.astype(jnp.float32)) ** 2)
        if ocfg.aug_loss:
            out2 = decoder_layer(eff, hfp_b, cfg, rq, cos_sin, mask)[0]
            loss = loss + jnp.mean(
                (out2.astype(jnp.float32) - target_b.astype(jnp.float32)) ** 2
            )
        return loss

    @jax.jit
    def train_step(lwc, opt_state, p_l, hq_b, target_b, hfp_b):
        loss, grads = jax.value_and_grad(loss_fn)(lwc, p_l, hq_b, target_b, hfp_b)
        updates, opt_state = opt.update(grads, opt_state, lwc)
        return optax.apply_updates(lwc, updates), opt_state, loss

    new_layers = []
    for l in range(cfg.num_layers):
        p_l = _layer_slice(params["layers"], l)
        targets = [run_fp(p_l, h_fp[b0 : b0 + bs]) for b0 in range(0, n, bs)]

        lwc = init_layer_lwc(p_l, cfg, ocfg.wspec)
        last_loss = float("nan")
        if ocfg.epochs > 0:
            opt_state = opt.init(lwc)
            for _ in range(ocfg.epochs):
                for bi, b0 in enumerate(range(0, n, bs)):
                    lwc, opt_state, loss = train_step(
                        lwc,
                        opt_state,
                        p_l,
                        h_q[b0 : b0 + bs],
                        targets[bi],
                        h_fp[b0 : b0 + bs],
                    )
                last_loss = float(loss)

        # bake learned clipping into real-quantized weights
        q_l = dict(p_l)
        for name in linear_names(cfg):
            entry = dict(q_l[name])
            entry["w"] = quantize_rtn(
                entry["w"],
                ocfg.wspec,
                pack=ocfg.pack,
                lwc_up=lwc[name]["up"],
                lwc_low=lwc[name]["low"],
            )
            q_l[name] = entry

        h_fp = jnp.concatenate(
            [run_fp(p_l, h_fp[b0 : b0 + bs]) for b0 in range(0, n, bs)], axis=0
        )
        h_q = jnp.concatenate(
            [run_q(q_l, h_q[b0 : b0 + bs]) for b0 in range(0, n, bs)], axis=0
        )
        new_layers.append(q_l)
        if progress:
            progress(l + 1, cfg.num_layers, last_loss)

    out = dict(params)
    out["layers"] = _stack_layers(new_layers)
    return out
