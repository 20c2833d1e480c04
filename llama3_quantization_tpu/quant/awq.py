"""AWQ — activation-aware weight quantization via per-channel scale search.

The reference study evaluates AWQ through externally-quantized checkpoints
(Efficient-ML HF releases; SURVEY.md §2.3 LMClass notes). This module
implements the algorithm natively: for each migration point, grid-search the
SmoothQuant exponent α over `s = act^α / w^(1-α)` minimizing the quantized
matmul's output MSE on calibration activations — the "salient channels get
finer grids" effect of the AWQ paper — then fold the winning scales and
RTN-quantize.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import ModelConfig
from ..models.params import MOE_EXPERT_LINEARS, linear_names
from ..models.transformer import NO_QUANT, decoder_layer
from .calibration import _layer_slice, _stack_layers, embed_calibration, layer_linear_inputs
from .qtensor import quantize_rtn, dequantize
from .quantizer import QuantSpec, fake_quant_dynamic
from .smoothing import fold_fc_fc, fold_norm_linears, fold_norm_moe, smoothquant_scale


@partial(jax.jit, static_argnames=("spec", "n_grid"))
def awq_search_alpha(
    x: jax.Array,  # [T, K] sampled calibration inputs
    w_cat: jax.Array,  # [K, N_total] concatenated group weights
    spec: QuantSpec,
    n_grid: int = 20,
) -> jax.Array:
    """Return the best per-channel scale over the α grid (AWQ's search,
    minimizing ||(x/s) @ Q(s·W) − x @ W||²)."""
    xf = x.astype(jnp.float32)
    wf = w_cat.astype(jnp.float32)
    act_amax = jnp.max(jnp.abs(xf), axis=0)
    w_amax = jnp.max(jnp.abs(wf), axis=1)
    ref = xf @ wf

    def loss_for(alpha):
        s = smoothquant_scale(act_amax, w_amax, alpha)
        ws = wf * s[:, None]
        wq = fake_quant_dynamic(ws.T, spec).T  # per-out-channel grid on [N,K] view
        out = (xf / s[None, :]) @ wq
        return jnp.mean((out - ref) ** 2)

    alphas = jnp.linspace(0.0, 1.0, n_grid)
    losses = jax.vmap(loss_for)(alphas)
    best = alphas[jnp.argmin(losses)]
    return smoothquant_scale(act_amax, w_amax, best)


def awq_quantize_model(
    params,
    cfg: ModelConfig,
    calib_tokens: np.ndarray,
    spec: QuantSpec,
    n_grid: int = 20,
    sample_tokens: int = 512,
    batch_size: int = 8,
    pack: bool = False,
):
    """Per-layer AWQ: search + fold scales at (ln1→qkv), (ln2→mlp-in),
    then RTN real-quant all decoder linears. Quantized-input propagation
    between layers as in GPTQ."""
    tokens = jnp.asarray(calib_tokens, jnp.int32)
    n = tokens.shape[0]
    h0, cos_sin, mask = embed_calibration(params, cfg, tokens)
    # per-batch stream (see quant/calibration.py): in-place propagation
    # frees each 8B-shape slice as its replacement lands
    h = [h0[b0 : b0 + batch_size] for b0 in range(0, n, batch_size)]
    del h0
    capture = jax.jit(lambda p, hb: layer_linear_inputs(p, hb, cfg, NO_QUANT, cos_sin, mask))
    run_layer = jax.jit(lambda p, hb: decoder_layer(p, hb, cfg, NO_QUANT, cos_sin, mask)[0])

    mlp_in = ["gate", "up"] if cfg.arch == "llama" else ["fc1"]
    rng = np.random.default_rng(0)
    new_layers: List[Dict[str, Any]] = []
    for l in range(cfg.num_layers):
        p_l = _layer_slice(params["layers"], l)
        caps = capture(p_l, h[0])

        def sample(name):
            x = caps[name].reshape(-1, caps[name].shape[-1])
            idx = rng.choice(x.shape[0], size=min(sample_tokens, x.shape[0]), replace=False)
            return x[np.asarray(idx)]

        p = dict(p_l)
        # ln1 -> q/k/v
        s1 = awq_search_alpha(
            sample("q"),
            jnp.concatenate([p[m]["w"] for m in ("q", "k", "v")], axis=1),
            spec,
            n_grid,
        )
        p["ln1"], qkv = fold_norm_linears(p["ln1"], [p["q"], p["k"], p["v"]], s1)
        p["q"], p["k"], p["v"] = qkv
        if cfg.is_moe:
            # ln2 -> router + every expert's gate/up. The α search scores a
            # column subsample of the stacked expert weights (the loss only
            # needs a representative output MSE; E·2N full columns would be
            # multi-GB at Mixtral scale).
            ew = jnp.concatenate(
                [
                    jnp.swapaxes(p["experts"][m]["w"], 0, 1).reshape(
                        p["experts"][m]["w"].shape[1], -1
                    )
                    for m in ("gate", "up")
                ],
                axis=1,
            )
            if ew.shape[1] > 16384:
                cols = rng.choice(ew.shape[1], size=16384, replace=False)
                ew = ew[:, np.asarray(cols)]
            s2 = awq_search_alpha(sample("experts_in"), ew, spec, n_grid)
            p["ln2"], p["router"], p["experts"] = fold_norm_moe(
                p["ln2"], p["router"], p["experts"], s2
            )
        else:
            # ln2 -> mlp inputs
            s2 = awq_search_alpha(
                sample(mlp_in[0]),
                jnp.concatenate([p[m]["w"] for m in mlp_in], axis=1),
                spec,
                n_grid,
            )
            p["ln2"], outs = fold_norm_linears(p["ln2"], [p[m] for m in mlp_in], s2)
            for m, e in zip(mlp_in, outs):
                p[m] = e

        # real-quantize all linears of this layer
        for name in linear_names(cfg):
            entry = dict(p[name])
            entry["w"] = quantize_rtn(entry["w"], spec, pack=pack)
            p[name] = entry
        if cfg.is_moe:
            experts = dict(p["experts"])
            for name in MOE_EXPERT_LINEARS:
                entry = dict(experts[name])
                entry["w"] = jax.vmap(lambda w: quantize_rtn(w, spec, pack=pack))(
                    entry["w"]
                )
                experts[name] = entry
            p["experts"] = experts

        for bi in range(len(h)):
            h[bi] = run_layer(p, h[bi])
        new_layers.append(p)

    out = dict(params)
    out["layers"] = _stack_layers(new_layers)
    return out
