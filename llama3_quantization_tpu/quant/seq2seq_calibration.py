"""Seq2seq (T5-family) GPTQ calibration: encoder + decoder streaming.

The reference wraps T0-3B only for evaluation (`/root/reference/models/
LMClass.py:35-39`) and its calibration drivers (`llama.py llama_sequential`,
`quant/omniquant.py`) are decoder-only; this module extends the same
layer-streaming Catcher schedule (quant/calibration.py) to the
encoder-decoder trunk so `api.quantize(method="gptq")` covers seq2seq
models too:

1. stream the encoder: per block, capture every linear's input
   activations (self q/k/v share one buffer, wi0/wi1 share one),
   accumulate Hessians, GPTQ-solve, then re-run the QUANTIZED block to
   produce the next block's stream (quantized-input propagation,
   `/root/reference/llama.py:135-144`);
2. the final quantized-encoder hidden state feeds the decoder phase:
   cross-attention k/v read that SAME tensor in every decoder block, so
   their (shared) Hessian is accumulated once and reused for all blocks'
   ck/cv solves;
3. stream the decoder blocks the same way (self q/k/v, o, cq, co,
   wi*/wo), teacher-forced on the provided decoder tokens.

Propagation and capture pin the reference-numerics "xla" dequant matmul
backend, like the decoder-only pipeline (quant/calibration.py:211-225).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.seq2seq import (
    NO_QUANT,
    Seq2SeqConfig,
    _pad_mask,
    _position_bias,
    _rms,
    _t5_attention,
    _t5_mlp,
)
from ..ops.matmul import qlinear
from .gptq import HessianState, gptq_quantize_weight, hessian_init, hessian_update
from .quantizer import QuantSpec


def _attn_capture(lp, x, kv, bm, cfg, rq, prefix=""):
    """`_t5_attention` with the o-projection's input exposed."""
    b, s, _ = x.shape
    t = kv.shape[1]
    h, dk = cfg.num_heads, cfg.d_kv
    q = qlinear(x, lp[prefix + "q"], None, rq.act).reshape(b, s, h, dk)
    k = qlinear(kv, lp[prefix + "k"], None, rq.act).reshape(b, t, h, dk)
    v = qlinear(kv, lp[prefix + "v"], None, rq.act).reshape(b, t, h, dk)
    scores = jnp.einsum("bshd,bthd->bhst", q, k).astype(jnp.float32)
    if bm is not None:
        scores = scores + bm
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o_in = jnp.einsum("bhst,bthd->bshd", probs, v).reshape(b, s, h * dk)
    return qlinear(o_in, lp[prefix + "o"], None, rq.act), o_in


def _mlp_capture(lp, x, cfg, rq):
    """`_t5_mlp` with the wo-projection's input exposed."""
    if cfg.gated_act:
        g = jax.nn.gelu(qlinear(x, lp["wi0"], None, rq.act), approximate=True)
        u = qlinear(x, lp["wi1"], None, rq.act)
        wo_in = g * u
    else:
        wo_in = jax.nn.relu(qlinear(x, lp["wi"], None, rq.act))
    return qlinear(wo_in, lp["wo"], None, rq.act), wo_in


def _enc_names(cfg: Seq2SeqConfig) -> List[str]:
    mlp = ["wi0", "wi1"] if cfg.gated_act else ["wi"]
    return ["q", "k", "v", "o"] + mlp + ["wo"]


def _dec_names(cfg: Seq2SeqConfig) -> List[str]:
    return _enc_names(cfg) + ["cq", "ck", "cv", "co"]


def seq2seq_capture_aliases(cfg: Seq2SeqConfig) -> Dict[str, str]:
    """Linears reading the same activation buffer (one Hessian each):
    self k/v off q's input, wi1 off wi0's, cross cv off ck's (both read
    the encoder output)."""
    al = {"k": "q", "v": "q", "cv": "ck"}
    if cfg.gated_act:
        al["wi1"] = "wi0"
    return al


def _layer_slice(layers, l: int):
    return jax.tree_util.tree_map(lambda a: a[l], layers)


def _stack_layers(layer_list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_list)


def gptq_quantize_seq2seq(
    params,
    cfg: Seq2SeqConfig,
    enc_tokens: np.ndarray,  # [n, S]
    dec_tokens: np.ndarray,  # [n, T] (start-shifted decoder input ids)
    spec: QuantSpec,
    blocksize: int = 128,
    percdamp: float = 0.01,
    actorder: bool = False,
    pack: bool = True,
    batch_size: int = 8,
    progress: Optional[Callable[[int, int, Dict[str, float]], None]] = None,
):
    """Sequential GPTQ over encoder then decoder blocks.

    Returns a new params pytree with every block linear replaced by a
    GPTQ `QuantizedTensor`; embeddings, norms, relative-bias tables and
    the lm_head stay dense (same policy as the decoder-only pipeline and
    `quantize_seq2seq_rtn`)."""
    from ..ops import matmul as _mm

    rq = NO_QUANT
    eps = cfg.layer_norm_eps
    enc_toks = jnp.asarray(enc_tokens, jnp.int32)
    dec_toks = jnp.asarray(dec_tokens, jnp.int32)
    n, s = enc_toks.shape
    t = dec_toks.shape[1]
    bs = min(batch_size, n)
    aliases = seq2seq_capture_aliases(cfg)

    enc_mask = _pad_mask(enc_toks, cfg.pad_token_id)  # [n, 1, 1, S]
    bias_enc = _position_bias(params["enc_rel"], s, s, True, cfg, jnp.float32)
    causal = jnp.where(
        jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0, -1e9
    ).astype(jnp.float32)[None, None]
    bias_dec = _position_bias(params["dec_rel"], t, t, False, cfg, jnp.float32) + causal

    shared = jnp.asarray(params["shared"])
    h_list = [shared[enc_toks[b0 : b0 + bs]] for b0 in range(0, n, bs)]
    m_list = [enc_mask[b0 : b0 + bs] for b0 in range(0, n, bs)]

    def _enc_capture(lp, hb, mb):
        with _mm.backend("xla"):
            caps: Dict[str, jax.Array] = {}
            x1 = _rms(lp["ln1"], hb, eps)
            caps["q"] = x1
            attn, o_in = _attn_capture(lp, x1, x1, bias_enc + mb, cfg, rq)
            caps["o"] = o_in
            h2 = hb + attn
            x2 = _rms(lp["ln2"], h2, eps)
            caps["wi0" if cfg.gated_act else "wi"] = x2
            _, wo_in = _mlp_capture(lp, x2, cfg, rq)
            caps["wo"] = wo_in
        return {k: v for k, v in caps.items() if k not in aliases}

    def _enc_fwd(lp, hb, mb):
        with _mm.backend("xla"):
            x = _rms(lp["ln1"], hb, eps)
            hb = hb + _t5_attention(lp, x, x, bias_enc + mb, cfg, rq)
            x = _rms(lp["ln2"], hb, eps)
            return hb + _t5_mlp(lp, x, cfg, rq)

    def _dec_capture(lp, hb, eh, mb):
        with _mm.backend("xla"):
            caps: Dict[str, jax.Array] = {}
            x1 = _rms(lp["ln1"], hb, eps)
            caps["q"] = x1
            attn, o_in = _attn_capture(lp, x1, x1, bias_dec, cfg, rq)
            caps["o"] = o_in
            h2 = hb + attn
            x2 = _rms(lp["ln2"], h2, eps)
            caps["cq"] = x2
            cattn, co_in = _attn_capture(lp, x2, eh, mb, cfg, rq, prefix="c")
            caps["co"] = co_in
            h3 = h2 + cattn
            x3 = _rms(lp["ln3"], h3, eps)
            caps["wi0" if cfg.gated_act else "wi"] = x3
            _, wo_in = _mlp_capture(lp, x3, cfg, rq)
            caps["wo"] = wo_in
        return {k: v for k, v in caps.items() if k not in aliases}

    def _dec_fwd(lp, hb, eh, mb):
        with _mm.backend("xla"):
            x = _rms(lp["ln1"], hb, eps)
            hb = hb + _t5_attention(lp, x, x, bias_dec, cfg, rq)
            x = _rms(lp["ln2"], hb, eps)
            hb = hb + _t5_attention(lp, x, eh, mb, cfg, rq, prefix="c")
            x = _rms(lp["ln3"], hb, eps)
            return hb + _t5_mlp(lp, x, cfg, rq)

    enc_capture = jax.jit(_enc_capture)
    enc_fwd = jax.jit(_enc_fwd)
    dec_capture = jax.jit(_dec_capture)
    dec_fwd = jax.jit(_dec_fwd)

    def quantize_block(q_l, names, cap_fn, cap_args, errs, extra_h=None):
        """One block: Hessians over the stream -> per-linear solves.
        `extra_h`: {name: HessianState} for linears whose Hessian was
        accumulated outside this block (the shared cross-k/v one)."""
        canon = {m: aliases.get(m, m) for m in names}
        uses: Dict[str, int] = {}
        for rep in canon.values():
            uses[rep] = uses.get(rep, 0) + 1
        hstate: Dict[str, HessianState] = {}
        for rep in set(canon.values()):
            if extra_h and rep in extra_h:
                continue
            hstate[rep] = hessian_init(q_l[rep].shape[0])
        for args in zip(*cap_args):
            caps = cap_fn(q_l, *args)
            for rep in hstate:
                hstate[rep] = hessian_update(hstate[rep], caps[rep])
        if extra_h:
            hstate.update(extra_h)
        for m in names:
            rep = canon[m]
            uses[rep] -= 1
            # the shared cross-Hessian must survive for LATER blocks too
            keep = extra_h and rep in extra_h
            H = (
                hstate[rep].H
                if (uses[rep] > 0 or keep)
                else hstate.pop(rep).H
            )
            qt, err = gptq_quantize_weight(
                q_l[m], H, spec, blocksize=blocksize, actorder=actorder,
                percdamp=percdamp, pack=pack,
            )
            if not keep and uses[rep] == 0:
                del H
            errs[m] = float(err)
            q_l[m] = qt
        return q_l

    # ---- encoder blocks ----
    total = cfg.num_layers + cfg.num_decoder_layers
    done = 0
    new_enc = []
    for l in range(cfg.num_layers):
        q_l = dict(_layer_slice(params["enc"]["layers"], l))
        errs: Dict[str, float] = {}
        q_l = quantize_block(
            q_l, _enc_names(cfg), enc_capture, (h_list, m_list), errs
        )
        for bi in range(len(h_list)):
            h_list[bi] = enc_fwd(q_l, h_list[bi], m_list[bi])
        new_enc.append(q_l)
        done += 1
        if progress:
            progress(done, total, errs)

    # quantized-encoder output: the decoder's cross k/v input stream
    final = jax.jit(lambda hb: _rms(params["enc_ln"], hb, eps))
    eh_list = [final(hb) for hb in h_list]
    del h_list

    # cross k/v Hessian: identical for every decoder block (same input
    # tensor) — accumulate once, reuse for all ck/cv solves
    h_cross = hessian_init(cfg.d_model)
    for eh in eh_list:
        h_cross = hessian_update(h_cross, eh)

    d_list = [shared[dec_toks[b0 : b0 + bs]] for b0 in range(0, n, bs)]

    # ---- decoder blocks ----
    new_dec = []
    for l in range(cfg.num_decoder_layers):
        q_l = dict(_layer_slice(params["dec"]["layers"], l))
        errs = {}
        q_l = quantize_block(
            q_l, _dec_names(cfg), dec_capture, (d_list, eh_list, m_list),
            errs, extra_h={"ck": h_cross},
        )
        for bi in range(len(d_list)):
            d_list[bi] = dec_fwd(q_l, d_list[bi], eh_list[bi], m_list[bi])
        new_dec.append(q_l)
        done += 1
        if progress:
            progress(done, total, errs)

    out = dict(params)
    out["enc"] = {"layers": _stack_layers(new_enc)}
    out["dec"] = {"layers": _stack_layers(new_dec)}
    return out


def split_calib_pairs(
    calib_tokens: np.ndarray, enc_frac: float = 0.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Derive (enc, dec) calibration streams from decoder-only-style
    [n, S] token samples: the first `enc_frac` of each row conditions the
    encoder, the rest is the teacher-forced decoder stream (a span-split
    of natural text — the T5 pretraining shape without sentinels)."""
    calib_tokens = np.asarray(calib_tokens)
    s = calib_tokens.shape[1]
    cut = max(1, int(s * enc_frac))
    return calib_tokens[:, :cut], calib_tokens[:, cut:]
