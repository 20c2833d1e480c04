"""SmoothQuant: activation-outlier migration for W8A8-class quantization.

The reference initializes LET parameters from offline `act_scales`/
`act_shifts` statistics with `s = act^α / w^(1-α)` and folds them through
norm→linear boundaries (`/root/reference/quant/omniquant.py:230-252`,
`models/transformation.py`). Here the statistics are computed in-framework
from a calibration stream and the folds are pure param rewrites; running
`--epochs 0`-style SmoothQuant is: fold scales → RTN-quantize weights →
evaluate with runtime activation quantization.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import ModelConfig
from ..models.params import linear_names
from ..models.transformer import NO_QUANT, decoder_layer
from .calibration import _layer_slice, _stack_layers, embed_calibration, layer_linear_inputs
from .smoothing import fold_fc_fc, fold_norm_linears, smoothquant_scale


def collect_act_stats(
    params,
    cfg: ModelConfig,
    calib_tokens: np.ndarray,
    batch_size: int = 8,
):
    """Per-layer, per-linear activation |max| and mean over the calibration
    stream — the in-framework equivalent of the reference's offline
    `act_scales/{net}.pt` + `act_shifts/{net}.pt` (`main.py:360-364`)."""
    tokens = jnp.asarray(calib_tokens, jnp.int32)
    n = tokens.shape[0]
    h0, cos_sin, mask = embed_calibration(params, cfg, tokens)
    # per-batch stream (see quant/calibration.py): in-place propagation
    # frees each 8B-shape slice as its replacement lands
    h = [h0[b0 : b0 + batch_size] for b0 in range(0, n, batch_size)]
    del h0
    capture = jax.jit(lambda p, hb: layer_linear_inputs(p, hb, cfg, NO_QUANT, cos_sin, mask))
    run_layer = jax.jit(lambda p, hb: decoder_layer(p, hb, cfg, NO_QUANT, cos_sin, mask)[0])
    names = list(linear_names(cfg))
    if cfg.is_moe:
        names.append("experts_in")  # shared router/expert gate-up input
    stats = []
    for l in range(cfg.num_layers):
        p_l = _layer_slice(params["layers"], l)
        absmax = {m: None for m in names}
        mean_acc = {m: 0.0 for m in names}
        count = 0
        for bi in range(len(h)):
            caps = capture(p_l, h[bi])
            for m in names:
                x = caps[m].astype(jnp.float32).reshape(-1, caps[m].shape[-1])
                amax = jnp.max(jnp.abs(x), axis=0)
                absmax[m] = amax if absmax[m] is None else jnp.maximum(absmax[m], amax)
                mean_acc[m] = mean_acc[m] + jnp.sum(x, axis=0)
            count += caps[names[0]].reshape(-1, caps[names[0]].shape[-1]).shape[0]
            h[bi] = run_layer(p_l, h[bi])
        stats.append(
            {
                m: {"absmax": absmax[m], "mean": mean_acc[m] / count}
                for m in names
            }
        )
    return stats


def save_act_stats(stats, path: str) -> None:
    """Persist per-layer activation stats (the reference's offline
    `act_scales/{net}.pt` + `act_shifts/{net}.pt` artifacts,
    `main.py:360-364`)."""
    payload = {}
    for l, layer in enumerate(stats):
        for name, d in layer.items():
            payload[f"{l}/{name}/absmax"] = np.asarray(d["absmax"])
            payload[f"{l}/{name}/mean"] = np.asarray(d["mean"])
    np.savez(path, **payload)


def load_act_stats(path: str):
    data = np.load(path)
    layers: dict = {}
    for key in data.files:
        l, name, kind = key.split("/")
        layers.setdefault(int(l), {}).setdefault(name, {})[kind] = jnp.asarray(data[key])
    return [layers[l] for l in sorted(layers)]


def _w_absmax_in(entries) -> jax.Array:
    """Per-input-channel |max| across a group of [K, N] weights."""
    return jnp.max(
        jnp.stack([jnp.max(jnp.abs(e["w"].astype(jnp.float32)), axis=1) for e in entries]),
        axis=0,
    )


def smooth_layer(
    p_l: Dict[str, Any],
    layer_stats: Dict[str, Dict[str, jax.Array]],
    cfg: ModelConfig,
    alpha: float = 0.5,
    use_shift: bool = False,
) -> Dict[str, Any]:
    """Fold SmoothQuant scales at every migration point of one layer:
    (norm1 -> q/k/v), (norm2 -> mlp-in linears), (v -> o)."""
    p = dict(p_l)
    mlp_in = ["gate", "up"] if cfg.arch == "llama" else ["fc1"]

    if cfg.is_moe:
        from .smoothing import fold_norm_moe

        # norm1 -> q/k/v (standard), norm2 -> router + every expert's
        # gate/up (scale-only — bias-free experts)
        s1 = smoothquant_scale(
            layer_stats["q"]["absmax"], _w_absmax_in([p[m] for m in ("q", "k", "v")]), alpha
        )
        shift1 = layer_stats["q"]["mean"] if use_shift else None
        p["ln1"], qkv = fold_norm_linears(p["ln1"], [p["q"], p["k"], p["v"]], s1, shift1)
        p["q"], p["k"], p["v"] = qkv
        expert_wmax = jnp.max(
            jnp.stack(
                [
                    jnp.max(jnp.abs(p["experts"][m]["w"].astype(jnp.float32)), axis=(0, 2))
                    for m in ("gate", "up")
                ]
            ),
            axis=0,
        )
        s2 = smoothquant_scale(layer_stats["experts_in"]["absmax"], expert_wmax, alpha)
        p["ln2"], p["router"], p["experts"] = fold_norm_moe(
            p["ln2"], p["router"], p["experts"], s2
        )
        return _smooth_v_o(p, layer_stats, cfg, alpha)

    if cfg.parallel_block:
        # Falcon: one shared LN feeds q/k/v AND the MLP input — fold once
        # across all of them
        group = ["q", "k", "v"] + mlp_in
        s1 = smoothquant_scale(
            layer_stats["q"]["absmax"], _w_absmax_in([p[m] for m in group]), alpha
        )
        shift1 = layer_stats["q"]["mean"] if use_shift else None
        p["ln1"], outs = fold_norm_linears(p["ln1"], [p[m] for m in group], s1, shift1)
        for m, e in zip(group, outs):
            p[m] = e
    else:
        # norm1 -> q/k/v
        s1 = smoothquant_scale(
            layer_stats["q"]["absmax"], _w_absmax_in([p[m] for m in ("q", "k", "v")]), alpha
        )
        shift1 = layer_stats["q"]["mean"] if use_shift else None
        p["ln1"], qkv = fold_norm_linears(p["ln1"], [p["q"], p["k"], p["v"]], s1, shift1)
        p["q"], p["k"], p["v"] = qkv

        # norm2 -> mlp input linears
        key2 = mlp_in[0]
        s2 = smoothquant_scale(
            layer_stats[key2]["absmax"], _w_absmax_in([p[m] for m in mlp_in]), alpha
        )
        shift2 = layer_stats[key2]["mean"] if use_shift else None
        p["ln2"], outs = fold_norm_linears(p["ln2"], [p[m] for m in mlp_in], s2, shift2)
        for m, e in zip(mlp_in, outs):
            p[m] = e

    return _smooth_v_o(p, layer_stats, cfg, alpha)


def _smooth_v_o(p, layer_stats, cfg: ModelConfig, alpha: float):
    """v -> o fold: per o-input channel (== v output channel for MHA). With
    GQA the o input is the repeated-v layout, so stats and weight ranges
    are max-reduced over each kv head's repeat group first, and the fold
    scales v once / o per repeated copy."""
    nv = p["v"]["w"].shape[1]
    o_in_amax = _reduce_to_v_layout(layer_stats["o"]["absmax"], cfg, nv)
    w_o_amax = _reduce_to_v_layout(
        jnp.max(jnp.abs(p["o"]["w"].astype(jnp.float32)), axis=1), cfg, nv
    )
    sv = smoothquant_scale(o_in_amax, w_o_amax, alpha)
    if p["o"]["w"].shape[0] == nv:
        p["v"], p["o"] = fold_fc_fc(p["v"], p["o"], sv, None)
    else:
        p["v"], p["o"] = _fold_v_o_gqa(p["v"], p["o"], sv, cfg)
    return p


def _reduce_to_v_layout(x: jax.Array, cfg: ModelConfig, nv: int) -> jax.Array:
    """Max-reduce a per-o-input-channel vector to v's column layout."""
    if x.shape[0] == nv:
        return x
    rep = x.shape[0] // nv
    return x.reshape(cfg.num_kv_heads, rep, cfg.head_dim_).max(axis=1).reshape(nv)


def _fold_v_o_gqa(v_entry, o_entry, scale, cfg: ModelConfig):
    """v->o fold when o's input is the GQA-repeated v output: scale v
    columns once, o rows per repeated copy."""
    from .smoothing import sanitize_scale

    s = sanitize_scale(scale)
    nv = v_entry["w"].shape[1]
    rep = o_entry["w"].shape[0] // nv
    hd = cfg.head_dim_
    nv_h = nv // hd
    new_v = dict(v_entry)
    new_v["w"] = (v_entry["w"] / s[None, :].astype(v_entry["w"].dtype)).astype(v_entry["w"].dtype)
    if "b" in v_entry:
        new_v["b"] = (v_entry["b"] / s).astype(v_entry["b"].dtype)
    s_rep = jnp.tile(s.reshape(nv_h, 1, hd), (1, rep, 1)).reshape(-1)
    new_o = dict(o_entry)
    new_o["w"] = (o_entry["w"] * s_rep[:, None].astype(o_entry["w"].dtype)).astype(o_entry["w"].dtype)
    return new_v, new_o


def smoothquant_model(
    params,
    cfg: ModelConfig,
    calib_tokens: np.ndarray,
    alpha: float = 0.5,
    use_shift: Optional[bool] = None,
    act_stats=None,
    batch_size: int = 8,
):
    """Apply SmoothQuant migration to every decoder layer. Returns new
    params (still fp — quantize afterwards with RTN/GPTQ + runtime act
    quant, as the reference's `--let --epochs 0` path does)."""
    if use_shift is None:
        use_shift = cfg.arch == "opt"  # reference applies shifts for OPT
    if act_stats is None:
        act_stats = collect_act_stats(params, cfg, calib_tokens, batch_size)
    new_layers = [
        smooth_layer(_layer_slice(params["layers"], l), act_stats[l], cfg, alpha, use_shift)
        for l in range(cfg.num_layers)
    ]
    out = dict(params)
    out["layers"] = _stack_layers(new_layers)
    return out
