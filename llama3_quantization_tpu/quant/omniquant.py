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

With `OmniConfig.let=True`, LET (learnable equivalent transformation)
scales/shifts train jointly with LWC under two AdamW learning-rate groups
(the reference's optimizer split, `quant/omniquant.py:257-264`), folded
differentiably each step and baked in permanently at the end.
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
    let: bool = False  # joint learnable-equivalent-transformation training
    let_lr: float = 5e-3
    weight_decay: float = 0.0
    batch_size: int = 2
    aug_loss: bool = False
    pack: bool = False
    #: directory for resumable per-layer aux params (the reference's
    #: `omni_parameters.pth` written after every layer, `omniquant.py:309-311`)
    resume_dir: Optional[str] = None

    def __post_init__(self):
        if not self.wspec.lwc:
            object.__setattr__(self, "wspec", dataclasses.replace(self.wspec, lwc=True))


# ---------------------------------------------------------------------------
# LET — learnable equivalent transformation (reference `--let`:
# smoothing scales/shifts as trainable parameters folded *temporarily*
# during block training, `quant/utils.py:62-101` + `models/transformation.py`)
# ---------------------------------------------------------------------------


def init_layer_let(
    p_l: Dict[str, Any],
    cfg: ModelConfig,
    act_stats=None,
    alpha: float = 0.5,
    use_shift: bool = False,
):
    """Trainable smoothing params for one layer. Scales init from the
    SmoothQuant formula when activation stats are available (the reference's
    act_scales init, `quant/omniquant.py:230-252`), else ones.

    `use_shift` mirrors the reference's gate (`quant/omniquant.py:226-229`):
    channel shifts train only for non-llama families with activation
    quantization; otherwise the shift params are omitted entirely (the
    reference registers them as zeros but excludes them from the optimizer,
    `quant/utils.py:8-14`)."""
    import jax.numpy as jnp

    from .smoothing import smoothquant_scale

    d = p_l["q"]["w"].shape[0]

    def w_absmax(names):
        return jnp.max(
            jnp.stack(
                [jnp.max(jnp.abs(p_l[n]["w"].astype(jnp.float32)), axis=1) for n in names]
            ),
            axis=0,
        )

    if cfg.is_moe:
        # ln2 feeds every expert's gate/up: absmax over experts [E, K, N]
        mlp_key = "experts_in"
        mlp_wmax = jnp.max(
            jnp.stack(
                [
                    jnp.max(
                        jnp.abs(p_l["experts"][n]["w"].astype(jnp.float32)), axis=(0, 2)
                    )
                    for n in ("gate", "up")
                ]
            ),
            axis=0,
        )
    else:
        mlp_key = "gate" if cfg.arch == "llama" else "fc1"
        mlp_wmax = w_absmax([mlp_key])

    if act_stats is not None:
        qkv_scale = smoothquant_scale(act_stats["q"]["absmax"], w_absmax(["q", "k", "v"]), alpha)
        fc1_scale = smoothquant_scale(act_stats[mlp_key]["absmax"], mlp_wmax, alpha)
    else:
        qkv_scale = jnp.ones((d,), jnp.float32)
        fc1_scale = jnp.ones((d,), jnp.float32)
    let = {
        "qkv_scale": qkv_scale,
        **({"qkv_shift": jnp.zeros((d,), jnp.float32)} if use_shift else {}),
        "fc1_scale": fc1_scale,
        # no fc1_shift for MoE: the scale-only fold has no bias target
        **(
            {"fc1_shift": jnp.zeros((d,), jnp.float32)}
            if use_shift and not cfg.is_moe
            else {}
        ),
        "out_scale": jnp.ones((p_l["v"]["w"].shape[1],), jnp.float32),
        # q<->k scale: shared across heads AND equal within each RoPE
        # rotation pair (dims i and i+hd/2 mix under rotation, so only
        # pair-constant scales keep q·kᵀ exactly invariant) -> hd/2 free
        # values, mirrored onto both halves
        "qkt_scale": jnp.ones((cfg.head_dim_ // 2,), jnp.float32),
    }
    return let


def apply_let(p_l: Dict[str, Any], let, cfg: ModelConfig):
    """Differentiable temporary fold of the LET params
    (`smooth_*_temporary`, transformation.py:24-69)."""
    import jax.numpy as jnp

    from .smoothing import fold_fc_fc, fold_norm_linears
    from .smoothquant import _fold_v_o_gqa

    p = dict(p_l)
    if cfg.parallel_block:
        mlp_in = ["gate", "up"] if cfg.arch == "llama" else ["fc1"]
        group = ["q", "k", "v"] + mlp_in
        p["ln1"], outs = fold_norm_linears(
            p["ln1"], [p[m] for m in group], let["qkv_scale"], let.get("qkv_shift")
        )
        for m, e in zip(group, outs):
            p[m] = e
    elif cfg.is_moe:
        from .smoothing import fold_norm_moe

        p["ln1"], qkv = fold_norm_linears(
            p["ln1"], [p["q"], p["k"], p["v"]], let["qkv_scale"], let.get("qkv_shift")
        )
        p["q"], p["k"], p["v"] = qkv
        # scale-only: bias-free experts give a shift nowhere to fold
        p["ln2"], p["router"], p["experts"] = fold_norm_moe(
            p["ln2"], p["router"], p["experts"], let["fc1_scale"]
        )
    else:
        mlp_in = ["gate", "up"] if cfg.arch == "llama" else ["fc1"]
        p["ln1"], qkv = fold_norm_linears(
            p["ln1"], [p["q"], p["k"], p["v"]], let["qkv_scale"], let.get("qkv_shift")
        )
        p["q"], p["k"], p["v"] = qkv
        p["ln2"], outs = fold_norm_linears(
            p["ln2"], [p[m] for m in mlp_in], let["fc1_scale"], let.get("fc1_shift")
        )
        for m, e in zip(mlp_in, outs):
            p[m] = e
    # v -> o
    nv = p["v"]["w"].shape[1]
    if p["o"]["w"].shape[0] == nv:
        p["v"], p["o"] = fold_fc_fc(p["v"], p["o"], let["out_scale"])
    else:
        p["v"], p["o"] = _fold_v_o_gqa(p["v"], p["o"], let["out_scale"], cfg)
    # q <-> k: mirror the hd/2 free values across both RoPE halves, then
    # tile over flattened head columns. (Not smoothing.fold_q_k: its GQA
    # reduction averages ADJACENT columns, which would mix head-dim scales
    # under our head-major layout; the tiled per-column scales here are
    # exact for any kv-head count.)
    s_head = jnp.concatenate([let["qkt_scale"], let["qkt_scale"]])
    nq = p["q"]["w"].shape[1]
    s_q = jnp.tile(s_head, nq // cfg.head_dim_)
    nk = p["k"]["w"].shape[1]
    s_k = jnp.tile(s_head, nk // cfg.head_dim_)
    from .smoothing import sanitize_scale

    sq = sanitize_scale(s_q)
    q_new = dict(p["q"])
    q_new["w"] = (p["q"]["w"] / sq[None, :].astype(p["q"]["w"].dtype)).astype(p["q"]["w"].dtype)
    if "b" in q_new:
        q_new["b"] = (q_new["b"] / sq).astype(q_new["b"].dtype)
    sk = sanitize_scale(s_k)
    k_new = dict(p["k"])
    k_new["w"] = (p["k"]["w"] * sk[None, :].astype(p["k"]["w"].dtype)).astype(p["k"]["w"].dtype)
    if "b" in k_new:
        k_new["b"] = (k_new["b"] * sk).astype(k_new["b"].dtype)
    p["q"], p["k"] = q_new, k_new
    return p


def _save_aux(resume_dir: Optional[str], layer: int, aux) -> None:
    if not resume_dir:
        return
    import os

    from ..utils.pytree_io import save_pytree_npz

    os.makedirs(resume_dir, exist_ok=True)
    save_pytree_npz(os.path.join(resume_dir, f"omni_layer_{layer}.npz"), aux)


def _load_aux(resume_dir: Optional[str], layer: int, aux_like):
    if not resume_dir:
        return None
    import os

    from ..utils.pytree_io import load_pytree_npz

    path = os.path.join(resume_dir, f"omni_layer_{layer}.npz")
    if not os.path.exists(path):
        return None
    return load_pytree_npz(path, aux_like)


def init_layer_lwc(p_l: Dict[str, Any], cfg: ModelConfig, spec: QuantSpec):
    """Clipping logits for every linear of one layer (reference inits at 4.0
    so sigmoid≈0.98 ~ no clipping, `quant/quantizer.py:68`).

    MoE expert weights `[E, K, N]` get per-expert logits (leading E axis) —
    the reference fake-quants every Mixtral expert Linear the same way
    (`quant/omniquant.py:198-206`, gate/router excluded)."""
    lwc = {
        name: lwc_init(p_l[name]["w"].T.shape, spec) for name in linear_names(cfg)
    }
    if cfg.is_moe:
        from ..models.params import MOE_EXPERT_LINEARS

        experts = p_l["experts"]
        e_count = experts["gate"]["w"].shape[0]
        lwc["experts"] = {
            name: jax.tree_util.tree_map(
                lambda a: jnp.stack([a] * e_count),
                lwc_init(
                    (experts[name]["w"].shape[2], experts[name]["w"].shape[1]), spec
                ),
            )
            for name in MOE_EXPERT_LINEARS
        }
    return lwc


def _fake_quant_experts(w: jax.Array, spec: QuantSpec, up, low) -> jax.Array:
    """Fake-quant stacked expert weights [E, K, N] with per-expert LWC."""
    return jax.vmap(
        lambda we, u, l: fake_quant_dynamic(we.T, spec, u, l).T
    )(w, up, low).astype(w.dtype)


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
    if cfg.is_moe and "experts" in lwc:
        from ..models.params import MOE_EXPERT_LINEARS

        experts = dict(eff["experts"])
        for name in MOE_EXPERT_LINEARS:
            entry = dict(experts[name])
            entry["w"] = _fake_quant_experts(
                entry["w"], spec, lwc["experts"][name]["up"], lwc["experts"][name]["low"]
            )
            experts[name] = entry
        eff["experts"] = experts
    return eff


def omniquant_model(
    params,
    cfg: ModelConfig,
    calib_tokens: np.ndarray,
    ocfg: OmniConfig = OmniConfig(),
    rq: RuntimeQuantConfig = NO_QUANT,
    progress: Optional[Callable[[int, int, float], None]] = None,
    act_stats=None,
):
    """Blockwise LWC calibration over all layers; returns real-quantized
    params. With `epochs=0` this reduces to plain RTN (the reference's
    degenerate path, SURVEY.md §2.2).

    `act_stats`: per-layer activation statistics from
    `smoothquant.collect_act_stats` (or loaded via `load_act_stats`); with
    `let=True` they seed the LET scales with the SmoothQuant formula (the
    reference's act_scales init, `quant/omniquant.py:230-252`). None
    collects them in-line from the calibration stream when `let=True`."""
    tokens = jnp.asarray(calib_tokens, jnp.int32)
    n = tokens.shape[0]
    bs = min(ocfg.batch_size, n)
    h0, cos_sin, mask = embed_calibration(params, cfg, tokens)
    # per-batch lists (not one [n, S, d] monolith): propagation then frees
    # slices incrementally — at 8B shapes each stream is 2.1 GB and a
    # concat-based update transiently doubles it (measured OOM)
    h_fp = [h0[b0 : b0 + bs] for b0 in range(0, n, bs)]
    h_q = list(h_fp)
    del h0

    if ocfg.let and act_stats is None:
        from .smoothquant import collect_act_stats

        act_stats = collect_act_stats(params, cfg, calib_tokens, batch_size=max(bs, 1))

    # channel shifts train only for non-llama families under activation
    # quantization (`quant/omniquant.py:226-229`)
    use_shift = cfg.arch not in ("llama", "mixtral") and rq.act is not None

    run_fp = jax.jit(lambda p, hb: decoder_layer(p, hb, cfg, NO_QUANT, cos_sin, mask)[0])

    def _run_q(p, hb):
        # quantized-stream propagation pins the reference-numerics dequant
        # path regardless of the process-global serving backend (the s4/a8
        # paths add activation quantization the optimization never saw,
        # and the s4 grouped epilogue OOMs at calibration batch sizes —
        # see quant/calibration.py)
        from ..ops import matmul as _mm

        with _mm.backend("xla"):
            return decoder_layer(p, hb, cfg, rq, cos_sin, mask)[0]

    run_q = jax.jit(_run_q)

    # two LR groups like the reference's AdamW([{let params, let_lr},
    # {lwc params, lwc_lr}]) (`quant/omniquant.py:257-264`)
    opt = optax.multi_transform(
        {
            "lwc": optax.adamw(ocfg.lwc_lr, weight_decay=ocfg.weight_decay),
            "let": optax.adamw(ocfg.let_lr, weight_decay=ocfg.weight_decay),
        },
        lambda aux: {k: k for k in aux},
    )

    def apply_aux(aux, p_l):
        eff = apply_let(p_l, aux["let"], cfg) if "let" in aux else p_l
        return apply_lwc(eff, aux["lwc"], cfg, ocfg.wspec)

    def loss_fn(aux, p_l, hq_b, target_b, target2_b):
        eff = apply_aux(aux, p_l)
        out = decoder_layer(eff, hq_b, cfg, rq, cos_sin, mask)[0]
        loss = jnp.mean((out.astype(jnp.float32) - target_b.astype(jnp.float32)) ** 2)
        if ocfg.aug_loss:
            # reference aug loss (`quant/omniquant.py:219-221,277-278`):
            # the SAME quantized output also matches the fp layer applied
            # to the quantized input stream
            loss = loss + jnp.mean(
                (out.astype(jnp.float32) - target2_b.astype(jnp.float32)) ** 2
            )
        return loss

    @jax.jit
    def train_step(aux, opt_state, p_l, hq_b, target_b, target2_b):
        loss, grads = jax.value_and_grad(loss_fn)(aux, p_l, hq_b, target_b, target2_b)
        updates, opt_state = opt.update(grads, opt_state, aux)
        return optax.apply_updates(aux, updates), opt_state, loss

    import os as _os
    import time as _time

    # L3Q_OMNI_PROFILE=1: per-layer phase timings to stderr (round-5
    # regression forensics — see docs/BENCH_NOTES.md omniquant section)
    _prof = _os.environ.get("L3Q_OMNI_PROFILE") == "1"

    def _sync(xs):
        if _prof:
            jax.block_until_ready(xs)
        return _time.time()

    new_layers = []
    for l in range(cfg.num_layers):
        p_l = _layer_slice(params["layers"], l)
        _t0 = _time.time()
        # aug targets first (they read the PRE-update quantized stream):
        # fp layer on the quantized inputs (fp_inps_2, `quant/omniquant.py:
        # 219-221`)
        targets2 = (
            [run_fp(p_l, hb) for hb in h_q] if ocfg.aug_loss else None
        )
        _t1 = _sync(targets2)
        # fp propagation in place — the updated fp stream IS the target
        # list (the reference's fp_inps double duty, `omniquant.py:213-221`)
        for bi in range(len(h_fp)):
            h_fp[bi] = run_fp(p_l, h_fp[bi])
        targets = h_fp
        _t2 = _sync(targets)
        if targets2 is None:
            targets2 = targets

        aux: Dict[str, Any] = {"lwc": init_layer_lwc(p_l, cfg, ocfg.wspec)}
        if ocfg.let:
            aux["let"] = init_layer_let(
                p_l, cfg, act_stats[l] if act_stats else None, use_shift=use_shift
            )
        last_loss = float("nan")
        resumed = _load_aux(ocfg.resume_dir, l, aux)
        if resumed is not None:
            aux = resumed
        elif ocfg.epochs > 0:
            opt_state = opt.init(aux)
            best = aux
            for _ in range(ocfg.epochs):
                for bi in range(len(h_q)):
                    aux, opt_state, loss = train_step(
                        aux,
                        opt_state,
                        p_l,
                        h_q[bi],
                        targets[bi],
                        targets2[bi],
                    )
                last_loss = float(loss)
                # NaN guard: the reference drops into pdb
                # (`quant/omniquant.py:280-282`); we roll back to the last
                # finite epoch and stop training this layer
                if not np.isfinite(last_loss):
                    aux = best
                    break
                best = aux
            _save_aux(ocfg.resume_dir, l, aux)
        _t3 = _sync(aux)

        # fold LET permanently, then bake learned clipping into
        # real-quantized weights (`smooth_and_quant_inplace`,
        # quant/utils.py:112-137)
        q_l = dict(apply_let(p_l, aux["let"], cfg)) if ocfg.let else dict(p_l)
        lwc = aux["lwc"]
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
        if cfg.is_moe and "experts" in lwc:
            from ..models.params import MOE_EXPERT_LINEARS

            experts = dict(q_l["experts"])
            for name in MOE_EXPERT_LINEARS:
                entry = dict(experts[name])
                entry["w"] = jax.vmap(
                    lambda w, up, low: quantize_rtn(
                        w, ocfg.wspec, pack=ocfg.pack, lwc_up=up, lwc_low=low
                    )
                )(entry["w"], lwc["experts"][name]["up"], lwc["experts"][name]["low"])
                experts[name] = entry
            q_l["experts"] = experts

        _t4 = _sync(q_l)
        # h_fp already advanced (targets alias it); advance the quantized
        # stream in place so each old batch frees as its replacement lands
        for bi in range(len(h_q)):
            h_q[bi] = run_q(q_l, h_q[bi])
        new_layers.append(q_l)
        if _prof:
            _t5 = _sync(h_q)
            import sys as _sys

            print(
                f"[omni-prof] layer {l}: aug-targets {_t1-_t0:.2f}s "
                f"fp-prop {_t2-_t1:.2f}s train {_t3-_t2:.2f}s "
                f"quantize+pack {_t4-_t3:.2f}s q-prop {_t5-_t4:.2f}s",
                file=_sys.stderr, flush=True,
            )
        if progress:
            progress(l + 1, cfg.num_layers, last_loss)

    out = dict(params)
    out["layers"] = _stack_layers(new_layers)
    return out
