"""Layer-streaming calibration: the TPU version of the reference's Catcher.

The reference captures first-layer inputs with a hook module and then walks
decoder layers one at a time on GPU (`/root/reference/quant/omniquant.py:
119-144,195-338`, `llama.py:32-187`). Here the same streaming schedule is
expressed functionally: activations for all calibration samples are kept on
device as one array, and each layer is (1) instrumented to expose its linear
inputs, (2) quantized, (3) re-run quantized to produce the next layer's
stream (quantized-input propagation, `llama.py:135-144`).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import ModelConfig
from ..models.params import linear_names
from ..models.transformer import (
    NO_QUANT,
    RuntimeQuantConfig,
    causal_mask,
    decoder_layer,
    embed,
    rope_cos_sin,
)
from ..ops.matmul import qlinear
from .gptq import (
    HessianState,
    fake_quant_int8_per_tensor,
    gptq_quantize_weight,
    hessian_init,
    hessian_update,
    snr_error,
)
from .quantizer import QuantSpec


def _snr_row(name, layer_idx, w_fp, w_q, x, weight_error, elapsed):
    """One SNR diagnostics row (the reference `print_loss` probe,
    `/root/reference/gptq.py:101-126`): compare the quantized weight's
    output against the fp output on the captured inputs, with and without
    int8 input quantization."""
    from ..ops.matmul import qmatmul

    x2 = x.reshape(-1, x.shape[-1])
    y_fp = x2.astype(jnp.float32) @ w_fp.astype(jnp.float32)
    y_q = qmatmul(x2, w_q)
    y_q_in = qmatmul(fake_quant_int8_per_tensor(x2), w_q)
    return {
        "name": f"layer{layer_idx}.{name}",
        "weight_error": weight_error,
        "fp_inp_snr": snr_error(y_q, y_fp),
        "q_inp_snr": snr_error(y_q_in, y_fp),
        "time": elapsed,
    }


def layer_linear_inputs(
    p: Dict[str, Any],
    h: jax.Array,
    cfg: ModelConfig,
    rq: RuntimeQuantConfig,
    cos_sin,
    mask,
) -> Dict[str, jax.Array]:
    """One instrumented decoder-layer forward returning the input activation
    of every linear (the hook-capture of `llama.py:106-121`)."""
    from ..models.transformer import _attention, _norm, apply_rope

    b, s, _ = h.shape
    hd = cfg.head_dim_
    out: Dict[str, jax.Array] = {}
    attn_in = _norm(p["ln1"], h, cfg)
    out["q"] = out["k"] = out["v"] = attn_in
    q = qlinear(attn_in, p["q"]["w"], p["q"].get("b"), rq.act).reshape(b, s, cfg.num_heads, hd)
    k = qlinear(attn_in, p["k"]["w"], p["k"].get("b"), rq.act).reshape(b, s, cfg.num_kv_heads, hd)
    v = qlinear(attn_in, p["v"]["w"], p["v"].get("b"), rq.act).reshape(b, s, cfg.num_kv_heads, hd)
    if cos_sin is not None:
        cos, sin = cos_sin
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    # allow_flash: the eager path materializes [B, H, S, S] scores (4.3 GB
    # at b=8 S=2048) — flash keeps capture of 8B layers inside HBM; it
    # auto-falls-back when rq carries q/k/v/p hooks (transformer._flash_enabled)
    attn = _attention(q, k, v, mask, cfg, rq, allow_flash=True).reshape(
        b, s, cfg.num_heads * hd
    )
    out["o"] = attn
    attn_out = qlinear(attn, p["o"]["w"], p["o"].get("b"), rq.act)
    if cfg.parallel_block:
        mlp_in = attn_in  # Falcon: MLP reads the same shared-LN output
    else:
        h = h + attn_out
        mlp_in = _norm(p["ln2"], h, cfg)
    if cfg.is_moe:
        # shared input of every expert's gate/up (router input too); expert
        # down-inputs are derived per expert by the MoE GPTQ path
        out["experts_in"] = mlp_in
    elif cfg.arch == "llama":
        out["gate"] = out["up"] = mlp_in
        gate = qlinear(mlp_in, p["gate"]["w"], p["gate"].get("b"), rq.act)
        up = qlinear(mlp_in, p["up"]["w"], p["up"].get("b"), rq.act)
        out["down"] = jax.nn.silu(gate) * up
    else:
        out["fc1"] = mlp_in
        fc1 = qlinear(mlp_in, p["fc1"]["w"], p["fc1"].get("b"), rq.act)
        out["fc2"] = jax.nn.relu(fc1) if cfg.activation == "relu" else jax.nn.gelu(fc1)
    return out


def capture_aliases(cfg: ModelConfig) -> Dict[str, str]:
    """Capture keys that read the SAME activation buffer in
    `layer_linear_inputs` (q/k/v off attn_in; llama's gate/up off mlp_in;
    Falcon's parallel block feeds the MLP from the shared LN). jit outputs
    do not preserve object aliasing, so consumers dedup by this table —
    one Hessian/stat accumulation and one HBM buffer per canonical key."""
    al = {"k": "q", "v": "q"}
    if cfg.arch == "llama" and not cfg.is_moe:
        al["up"] = "gate"
    if cfg.parallel_block:
        al["fc1"] = "q"
    return al


def _layer_slice(layers, l: int):
    return jax.tree_util.tree_map(lambda a: a[l], layers)


def _stack_layers(layer_list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_list)


def embed_calibration(params, cfg: ModelConfig, tokens: jax.Array):
    """tokens [n, S] -> (h [n, S, D], cos_sin, mask)."""
    n, s = tokens.shape
    positions = jnp.arange(s)[None, :]
    h = embed(params, tokens, cfg, positions)
    cos_sin = (
        rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, h.dtype, cfg.rope_scaling_)
        if cfg.uses_rope
        else None
    )
    return h, cos_sin, causal_mask(s)


#: true_sequential sub-block ordering (`llama.py:92-96`): quantize earlier
#: groups before capturing inputs for later ones within the same layer
_TRUE_SEQ_GROUPS = {
    "llama": [("k", "v", "q"), ("o",), ("up", "gate"), ("down",)],
    "opt": [("k", "v", "q"), ("o",), ("fc1",), ("fc2",)],
    "falcon": [("k", "v", "q"), ("o",), ("fc1",), ("fc2",)],
}


def gptq_quantize_model(
    params,
    cfg: ModelConfig,
    calib_tokens: np.ndarray,  # [n, S]
    spec: QuantSpec,
    blocksize: int = 128,
    percdamp: float = 0.01,
    actorder: bool = False,
    pack: bool = False,
    batch_size: int = 8,
    rq: RuntimeQuantConfig = NO_QUANT,
    true_sequential: bool = False,
    progress: Optional[Callable[[int, int, Dict[str, float]], None]] = None,
    snr_log: Optional[list] = None,
):
    """Sequential GPTQ over all decoder layers (`llama.py llama_sequential`,
    `/root/reference/llama.py:32-187`).

    Pure function: returns a new params pytree with every decoder linear
    replaced by a GPTQ-quantized `QuantizedTensor`; embeddings/norms/lm_head
    untouched (reference quantizes only decoder-layer Linears).
    `true_sequential` quantizes sub-blocks in dataflow order, re-capturing
    inputs through already-quantized earlier groups (`llama.py:92-96`).

    `snr_log`: pass a list to collect per-linear SNR diagnostics rows (the
    reference's `GPTQ.print_loss` probe, `/root/reference/gptq.py:101-126`,
    broken there by a missing import; render with `gptq.format_snr_table`).
    """
    tokens = jnp.asarray(calib_tokens, jnp.int32)
    n = tokens.shape[0]
    h, cos_sin, mask = embed_calibration(params, cfg, tokens)
    # per-batch list instead of one [n, S, d] monolith: slices free
    # incrementally during re-propagation (at 8B shapes the monolith is
    # 2.1 GB and a concat re-propagation would transiently hold 2x that)
    h_list = [h[b0 : b0 + batch_size] for b0 in range(0, n, batch_size)]
    del h

    aliases = capture_aliases(cfg)

    def _capture(p, hb):
        # alias keys dropped INSIDE the jit: identical outputs are NOT
        # deduplicated into one device buffer, so returning q/k/v three
        # times would hold three copies of attn_in in HBM. xla backend
        # pinned for the same reasons as _run_layer below.
        from ..ops import matmul as _mm

        with _mm.backend("xla"):
            caps = layer_linear_inputs(p, hb, cfg, rq, cos_sin, mask)
        return {k: v for k, v in caps.items() if k not in aliases}

    capture = jax.jit(_capture)
    def _run_layer(p, hb):
        # quantized-input propagation uses the reference-numerics dequant
        # path REGARDLESS of the process-global serving backend: the
        # reference propagates through the fake-quant layer
        # (`/root/reference/llama.py:135-137`), and the s4/a8 execution
        # backends would (a) add per-token activation quantization the
        # solve never assumed and (b) at calibration batch sizes (16k
        # tokens) the s4 grouped-dot epilogue materializes a [G, B, N]
        # partial — 30 GB for down_proj at 8B, a measured OOM
        from ..ops import matmul as _mm

        with _mm.backend("xla"):
            return decoder_layer(p, hb, cfg, rq, cos_sin, mask)[0]

    run_layer = jax.jit(_run_layer)

    names = linear_names(cfg)
    if true_sequential and cfg.arch in _TRUE_SEQ_GROUPS:
        groups = [
            tuple(m for m in g if m in names)
            for g in _TRUE_SEQ_GROUPS[cfg.arch]
        ]
        groups = [g for g in groups if g]
    else:
        groups = [tuple(names)]

    def quantize_group(q_l, group, errs):
        # names reading the SAME captured buffer (q/k/v off attn_in,
        # gate/up off mlp_in — capture_aliases) share one Hessian
        # accumulation: identical math, one xxᵀ instead of three
        canon = {name: aliases.get(name, name) for name in group}
        uses: Dict[str, int] = {}
        for rep in canon.values():
            uses[rep] = uses.get(rep, 0) + 1
        hstate: Dict[str, HessianState] = {
            rep: hessian_init(q_l[rep]["w"].shape[0]) for rep in uses
        }
        caps0 = None
        for hb in h_list:
            caps = capture(q_l, hb)
            if caps0 is None and snr_log is not None:
                caps0 = caps  # ~1 GB at 8B shapes — keep only if SNR asked
            for rep in uses:
                hstate[rep] = hessian_update(hstate[rep], caps[rep])
        for name in group:
            entry = dict(q_l[name])
            t0 = time.perf_counter()
            rep = canon[name]
            uses[rep] -= 1
            H = hstate.pop(rep).H if uses[rep] == 0 else hstate[rep].H
            qt, err = gptq_quantize_weight(
                entry["w"],
                H,  # freed after its last consumer's solve (1.2 GB at 8B)
                spec,
                blocksize=blocksize,
                actorder=actorder,
                percdamp=percdamp,
                pack=pack,
            )
            del H
            errs[name] = float(err)
            if snr_log is not None:
                snr_log.append(
                    _snr_row(name, l, entry["w"], qt, caps0[rep], float(err),
                             time.perf_counter() - t0)
                )
            entry["w"] = qt
            q_l[name] = entry
        return q_l

    def quantize_experts(q_l, errs):
        """MoE experts: per-expert ROUTING-WEIGHTED Hessians — each token's
        contribution to expert e scales by sqrt(w_e(x)) (its top-k routing
        weight), so rarely-routed tokens barely shape e's grid while the
        tokens e actually serves dominate. gate/up share the weighted input
        Hessian; down uses the weighted Hessian of each expert's activation
        through its already-quantized gate/up."""
        from ..models.transformer import _moe_routing_weights
        from ..ops.matmul import qmatmul
        from .qtensor import QuantizedTensor

        caps_per_batch = []
        weights_per_batch = []  # [B, S, E] routing weights
        for hb in h_list:
            caps = capture(q_l, hb)
            x = caps["experts_in"]
            caps_per_batch.append(x)
            weights_per_batch.append(_moe_routing_weights(q_l, x, cfg))
        experts = dict(q_l["experts"])
        e_count = experts["gate"]["w"].shape[0] if not isinstance(
            experts["gate"]["w"], QuantizedTensor
        ) else experts["gate"]["w"].data.shape[0]
        new_e = {m: {"w": []} for m in ("gate", "up", "down")}
        for e in range(e_count):
            up_w = experts["up"]["w"][e]
            down_w = experts["down"]["w"][e]
            h_in = hessian_init(caps_per_batch[0].shape[-1])
            for x, wts in zip(caps_per_batch, weights_per_batch):
                sw = jnp.sqrt(wts[..., e])[..., None].astype(x.dtype)
                h_in = hessian_update(h_in, x * sw)
            qt_gate, err_g = gptq_quantize_weight(
                experts["gate"]["w"][e], h_in.H, spec, blocksize=blocksize,
                actorder=actorder, percdamp=percdamp, pack=pack)
            qt_up, err_u = gptq_quantize_weight(
                up_w, h_in.H, spec, blocksize=blocksize,
                actorder=actorder, percdamp=percdamp, pack=pack)
            h_down = hessian_init(down_w.shape[0])
            for x, wts in zip(caps_per_batch, weights_per_batch):
                act = jax.nn.silu(qmatmul(x, qt_gate)) * qmatmul(x, qt_up)
                sw = jnp.sqrt(wts[..., e])[..., None].astype(act.dtype)
                h_down = hessian_update(h_down, act * sw)
            qt_down, err_d = gptq_quantize_weight(
                down_w, h_down.H, spec, blocksize=blocksize,
                actorder=actorder, percdamp=percdamp, pack=pack)
            errs[f"expert{e}"] = float(err_g + err_u + err_d)
            new_e["gate"]["w"].append(qt_gate)
            new_e["up"]["w"].append(qt_up)
            new_e["down"]["w"].append(qt_down)
        for m in ("gate", "up", "down"):
            new_e[m]["w"] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *new_e[m]["w"]
            )
        q_l["experts"] = new_e
        return q_l

    new_layers = []
    for l in range(cfg.num_layers):
        q_l = dict(_layer_slice(params["layers"], l))
        errs: Dict[str, float] = {}
        for group in groups:
            q_l = quantize_group(q_l, group, errs)
        if cfg.is_moe:
            q_l = quantize_experts(q_l, errs)
        # quantized-input propagation for the next layer (in place: each
        # old batch frees as soon as its replacement lands)
        for bi in range(len(h_list)):
            h_list[bi] = run_layer(q_l, h_list[bi])
        new_layers.append(q_l)
        if progress:
            progress(l + 1, cfg.num_layers, errs)

    out = dict(params)
    out["layers"] = _stack_layers(new_layers)
    return out
