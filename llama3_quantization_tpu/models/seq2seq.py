"""Native T5-family encoder-decoder trunk (T0/T5/FLAN).

The reference special-cases T0-3B through `AutoModelForSeq2SeqLM`
(`/root/reference/models/LMClass.py:35-39`) and the harness ships an
`hf-seq2seq` adapter (`lm_eval/models/huggingface.py:422-586`); round 3
covered that surface only via the torch adapter. This module closes the
gap TPU-natively: a functional, scan-stacked T5 stack whose linears are
`qlinear` calls, so any transform that produces QuantizedTensor leaves
executes through the same storage/kernel paths as the decoder-only
trunk. Shipped seq2seq quantizers: RTN (`quantize_seq2seq_rtn`) and
GPTQ with encoder+decoder Catcher streaming
(`quant/seq2seq_calibration.gptq_quantize_seq2seq`, round 5), both
reachable via `api.quantize`; the remaining calibration algorithms
(AWQ/OmniQuant/...) are decoder-only surface — `cli.py` rejects them
for seq2seq checkpoints. PPL streams are likewise decoder-only by
design (the reference evaluates T0 on tasks only; `new_scripts/` has no
T0 PPL job), so `--eval_ppl` warns and skips for seq2seq.

Architecture notes (HF `modeling_t5.py` parity, tested in
tests/test_hf_parity.py):

- T5LayerNorm == RMSNorm (no mean subtraction, no bias), fp32 statistics;
- attention has NO 1/sqrt(d_kv) scaling (folded into init by T5);
- relative position bias: bucketed (num_buckets, max_distance) learned
  [buckets, H] embeddings, owned by block 0 and shared by all layers;
  bidirectional buckets for the encoder, causal for the decoder,
  none for cross-attention;
- v1.1 ("gated-gelu") MLP: wo(gelu(wi_0 x) * wi_1 x); v1.0: wo(relu(wi x));
- tied embeddings scale decoder output by d_model**-0.5 before the LM
  projection (untied checkpoints, e.g. T0/v1.1, carry a real lm_head).

Scoring is teacher-forced full-sequence (the eval harness's mode).
Generation has two decoders: `greedy_generate_seq2seq` (O(T^2) re-forward
over a fixed buffer — the simple reference) and the KV-cached incremental
`greedy_generate_seq2seq_cached` / `decode_step_seq2seq` (encoder + cross
K/V computed once, self K/V appended into a preallocated buffer — the
harness default; greedy streams identical, tested).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.matmul import qlinear

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_heads: int = 8
    num_layers: int = 6  # encoder
    num_decoder_layers: int = 6
    rel_buckets: int = 32
    rel_max_distance: int = 128
    gated_act: bool = True  # v1.1 gated-gelu vs v1.0 relu
    tie_word_embeddings: bool = False
    layer_norm_eps: float = 1e-6
    decoder_start_token_id: int = 0
    pad_token_id: int = 0
    eos_token_id: int = 1


def _rms(w: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (w * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)).astype(x.dtype)


def _relative_position_bucket(
    rel: jax.Array, bidirectional: bool, num_buckets: int, max_distance: int
) -> jax.Array:
    """HF `T5Attention._relative_position_bucket` verbatim semantics
    (`rel = memory_position - query_position`)."""
    ret = jnp.zeros_like(rel)
    n = rel
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _position_bias(
    emb: jax.Array,  # [buckets, H]
    qlen: int,
    klen: int,
    bidirectional: bool,
    cfg: Seq2SeqConfig,
    dtype,
) -> jax.Array:  # [1, H, qlen, klen]
    ctx = jnp.arange(qlen)[:, None]
    mem = jnp.arange(klen)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, bidirectional, cfg.rel_buckets, cfg.rel_max_distance
    )  # [q, k]
    bias = emb[buckets]  # [q, k, H]
    return jnp.transpose(bias, (2, 0, 1))[None].astype(dtype)


def _t5_attention(
    p: Params,
    x: jax.Array,  # [B, S, D] queries
    kv: jax.Array,  # [B, T, D] keys/values source
    bias_mask: Optional[jax.Array],  # [*, H or 1, S, T] additive (f32)
    cfg: Seq2SeqConfig,
    rq,
    prefix: str = "",
) -> jax.Array:
    b, s, _ = x.shape
    t = kv.shape[1]
    h, dk = cfg.num_heads, cfg.d_kv
    q = qlinear(x, p[prefix + "q"], None, rq.act).reshape(b, s, h, dk)
    k = qlinear(kv, p[prefix + "k"], None, rq.act).reshape(b, t, h, dk)
    v = qlinear(kv, p[prefix + "v"], None, rq.act).reshape(b, t, h, dk)
    # NO 1/sqrt(dk): T5 folds it into initialization
    scores = jnp.einsum("bshd,bthd->bhst", q, k).astype(jnp.float32)
    if bias_mask is not None:
        scores = scores + bias_mask
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhst,bthd->bshd", probs, v).reshape(b, s, h * dk)
    return qlinear(o, p[prefix + "o"], None, rq.act)


def _t5_mlp(p: Params, x: jax.Array, cfg: Seq2SeqConfig, rq) -> jax.Array:
    if cfg.gated_act:
        g = jax.nn.gelu(qlinear(x, p["wi0"], None, rq.act), approximate=True)
        u = qlinear(x, p["wi1"], None, rq.act)
        return qlinear(g * u, p["wo"], None, rq.act)
    hdn = jax.nn.relu(qlinear(x, p["wi"], None, rq.act))
    return qlinear(hdn, p["wo"], None, rq.act)


def _pad_mask(toks: jax.Array, pad_id: int) -> jax.Array:
    """[B, T] token ids -> [B, 1, 1, T] additive f32 (pad = -1e9)."""
    return jnp.where(toks == pad_id, -1e9, 0.0).astype(jnp.float32)[:, None, None, :]


from ..models.transformer import NO_QUANT, RuntimeQuantConfig  # noqa: E402


def encode(
    params: Params,
    enc_toks: jax.Array,  # [B, S]
    cfg: Seq2SeqConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
    enc_mask: Optional[jax.Array] = None,  # [B, 1, 1, S] additive
) -> jax.Array:
    emb = params["shared"]
    h = jnp.asarray(emb)[enc_toks] if not hasattr(emb, "k") else None
    if h is None:  # quantized embedding unsupported — keep fp shared table
        raise ValueError("shared embedding must stay a dense array")
    s = enc_toks.shape[1]
    bias = _position_bias(
        params["enc_rel"], s, s, True, cfg, jnp.float32
    )
    bm = bias if enc_mask is None else bias + enc_mask
    eps = cfg.layer_norm_eps

    def body(hc, lp):
        x = _rms(lp["ln1"], hc, eps)
        hc = hc + _t5_attention(lp, x, x, bm, cfg, rq)
        x = _rms(lp["ln2"], hc, eps)
        hc = hc + _t5_mlp(lp, x, cfg, rq)
        return hc, ()

    h, _ = jax.lax.scan(body, h, params["enc"]["layers"])
    return _rms(params["enc_ln"], h, eps)


def decode_logits(
    params: Params,
    dec_toks: jax.Array,  # [B, T] decoder input ids (start-shifted)
    enc_hidden: jax.Array,  # [B, S, D]
    cfg: Seq2SeqConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
    enc_mask: Optional[jax.Array] = None,  # [B, 1, 1, S] additive
) -> jax.Array:
    h = jnp.asarray(params["shared"])[dec_toks]
    t = dec_toks.shape[1]
    causal = jnp.where(
        jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0, -1e9
    ).astype(jnp.float32)[None, None]
    bias = _position_bias(params["dec_rel"], t, t, False, cfg, jnp.float32)
    self_bm = bias + causal
    cross_bm = enc_mask  # no positional bias on cross-attention
    eps = cfg.layer_norm_eps

    def body(hc, lp):
        x = _rms(lp["ln1"], hc, eps)
        hc = hc + _t5_attention(lp, x, x, self_bm, cfg, rq)
        x = _rms(lp["ln2"], hc, eps)
        hc = hc + _t5_attention(lp, x, enc_hidden, cross_bm, cfg, rq, prefix="c")
        x = _rms(lp["ln3"], hc, eps)
        hc = hc + _t5_mlp(lp, x, cfg, rq)
        return hc, ()

    h, _ = jax.lax.scan(body, h, params["dec"]["layers"])
    h = _rms(params["dec_ln"], h, eps)
    if cfg.tie_word_embeddings:
        h = h * (cfg.d_model ** -0.5)
        return jnp.einsum("btd,vd->btv", h, jnp.asarray(params["shared"]))
    return qlinear(h, params["lm_head"], None, rq.act)


def forward_logits_seq2seq(
    params: Params,
    enc_toks: jax.Array,
    dec_toks: jax.Array,
    cfg: Seq2SeqConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
) -> jax.Array:
    """Teacher-forced encoder+decoder forward (the harness scoring mode)."""
    enc_mask = _pad_mask(enc_toks, cfg.pad_token_id)
    enc_h = encode(params, enc_toks, cfg, rq, enc_mask)
    return decode_logits(params, dec_toks, enc_h, cfg, rq, enc_mask)


def greedy_generate_seq2seq(
    params: Params,
    enc_toks: jax.Array,  # [B, S]
    n_steps: int,
    cfg: Seq2SeqConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
) -> jax.Array:  # [B, n_steps]
    """Greedy decode by re-running the decoder over a fixed [B, n_steps+1]
    buffer each step (static shapes; O(T^2) — see module docstring)."""
    b = enc_toks.shape[0]
    enc_mask = _pad_mask(enc_toks, cfg.pad_token_id)
    enc_h = encode(params, enc_toks, cfg, rq, enc_mask)
    buf0 = jnp.full((b, n_steps + 1), cfg.pad_token_id, jnp.int32)
    buf0 = buf0.at[:, 0].set(cfg.decoder_start_token_id)

    def step(i, buf):
        logits = decode_logits(params, buf, enc_h, cfg, rq, enc_mask)
        nxt = jnp.argmax(logits[:, i, :], axis=-1).astype(jnp.int32)
        return buf.at[:, i + 1].set(nxt)

    buf = jax.lax.fori_loop(0, n_steps, step, buf0)
    return buf[:, 1:]


# ----------------------------------------------------------------------
# HF checkpoint loading (T5/T0/FLAN family)


def config_from_hf_seq2seq(path: str) -> Seq2SeqConfig:
    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    if c.get("model_type") not in ("t5", "mt5", "longt5"):
        raise ValueError(f"not a T5-family checkpoint: {c.get('model_type')}")
    ff = c.get("feed_forward_proj", "relu")
    return Seq2SeqConfig(
        vocab_size=c["vocab_size"],
        d_model=c["d_model"],
        d_kv=c["d_kv"],
        d_ff=c["d_ff"],
        num_heads=c["num_heads"],
        num_layers=c["num_layers"],
        num_decoder_layers=c.get("num_decoder_layers", c["num_layers"]),
        rel_buckets=c.get("relative_attention_num_buckets", 32),
        rel_max_distance=c.get("relative_attention_max_distance", 128),
        gated_act=ff.startswith("gated"),
        tie_word_embeddings=c.get("tie_word_embeddings", True),
        layer_norm_eps=c.get("layer_norm_epsilon", 1e-6),
        decoder_start_token_id=c.get("decoder_start_token_id", 0) or 0,
        pad_token_id=c.get("pad_token_id", 0) or 0,
        eos_token_id=c.get("eos_token_id", 1) or 1,
    )


def from_hf_seq2seq(path: str, dtype=jnp.float32) -> Tuple[Params, Seq2SeqConfig]:
    """Load a T5-family HF checkpoint into the scan-stacked pytree.

    Weights transpose to `[in, out]` (`y = x @ W` — the qlinear layout);
    per-stack leaves stack along a leading layer axis for `lax.scan`."""
    from .hf_loader import _load_tensors

    cfg = config_from_hf_seq2seq(path)
    raw = _load_tensors(path)

    def get(name):
        return jnp.asarray(raw[name].astype(np.float32), dtype)

    def lin(name):
        return jnp.asarray(raw[name].astype(np.float32).T, dtype)

    def stack(fmt, n, names):
        out: Dict[str, jax.Array] = {}
        for ours, theirs in names.items():
            leaves = []
            for i in range(n):
                nm = fmt.format(i=i) + theirs
                leaves.append(
                    lin(nm) if theirs.endswith(".weight") and "layer_norm" not in nm
                    else get(nm)
                )
            out[ours] = jnp.stack(leaves)
        return out

    enc_names = {
        "q": "layer.0.SelfAttention.q.weight",
        "k": "layer.0.SelfAttention.k.weight",
        "v": "layer.0.SelfAttention.v.weight",
        "o": "layer.0.SelfAttention.o.weight",
        "ln1": "layer.0.layer_norm.weight",
        "ln2": "layer.1.layer_norm.weight",
    }
    dec_names = {
        "q": "layer.0.SelfAttention.q.weight",
        "k": "layer.0.SelfAttention.k.weight",
        "v": "layer.0.SelfAttention.v.weight",
        "o": "layer.0.SelfAttention.o.weight",
        "cq": "layer.1.EncDecAttention.q.weight",
        "ck": "layer.1.EncDecAttention.k.weight",
        "cv": "layer.1.EncDecAttention.v.weight",
        "co": "layer.1.EncDecAttention.o.weight",
        "ln1": "layer.0.layer_norm.weight",
        "ln2": "layer.1.layer_norm.weight",
        "ln3": "layer.2.layer_norm.weight",
    }
    if cfg.gated_act:
        enc_mlp = {"wi0": "layer.1.DenseReluDense.wi_0.weight",
                   "wi1": "layer.1.DenseReluDense.wi_1.weight",
                   "wo": "layer.1.DenseReluDense.wo.weight"}
        dec_mlp = {"wi0": "layer.2.DenseReluDense.wi_0.weight",
                   "wi1": "layer.2.DenseReluDense.wi_1.weight",
                   "wo": "layer.2.DenseReluDense.wo.weight"}
    else:
        enc_mlp = {"wi": "layer.1.DenseReluDense.wi.weight",
                   "wo": "layer.1.DenseReluDense.wo.weight"}
        dec_mlp = {"wi": "layer.2.DenseReluDense.wi.weight",
                   "wo": "layer.2.DenseReluDense.wo.weight"}

    params: Params = {
        "shared": get("shared.weight"),
        "enc": {"layers": stack("encoder.block.{i}.", cfg.num_layers,
                                {**enc_names, **enc_mlp})},
        "dec": {"layers": stack("decoder.block.{i}.", cfg.num_decoder_layers,
                                {**dec_names, **dec_mlp})},
        "enc_ln": get("encoder.final_layer_norm.weight"),
        "dec_ln": get("decoder.final_layer_norm.weight"),
        "enc_rel": get(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "dec_rel": get(
            "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin("lm_head.weight")
    return params, cfg


def init_seq2seq_params(
    cfg: Seq2SeqConfig, key: jax.Array, dtype=jnp.float32
) -> Params:
    """Seeded synthetic init with the exact `from_hf_seq2seq` pytree
    layout (scan-stacked [L, in, out] linears, shared rel-bias tables) —
    for tests, golden studies, and benches in the zero-egress container
    where no checkpoint exists."""
    d, dk, ff, h = cfg.d_model, cfg.d_kv, cfg.d_ff, cfg.num_heads
    keys = iter(jax.random.split(key, 64))

    def lin(n, i, o):
        return (jax.random.normal(next(keys), (n, i, o), dtype)
                * (0.4 / math.sqrt(i)))

    def side(n, cross):
        p = {
            "q": lin(n, d, h * dk), "k": lin(n, d, h * dk),
            "v": lin(n, d, h * dk), "o": lin(n, h * dk, d),
            "ln1": jnp.ones((n, d), dtype), "ln2": jnp.ones((n, d), dtype),
        }
        if cross:
            p.update(
                cq=lin(n, d, h * dk), ck=lin(n, d, h * dk),
                cv=lin(n, d, h * dk), co=lin(n, h * dk, d),
                ln3=jnp.ones((n, d), dtype),
            )
        if cfg.gated_act:
            p.update(wi0=lin(n, d, ff), wi1=lin(n, d, ff), wo=lin(n, ff, d))
        else:
            p.update(wi=lin(n, d, ff), wo=lin(n, ff, d))
        return {"layers": p}

    params: Params = {
        "shared": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.5,
        "enc": side(cfg.num_layers, cross=False),
        "dec": side(cfg.num_decoder_layers, cross=True),
        "enc_ln": jnp.ones((d,), dtype),
        "dec_ln": jnp.ones((d,), dtype),
        "enc_rel": jax.random.normal(next(keys), (cfg.rel_buckets, h), dtype) * 0.1,
        "dec_rel": jax.random.normal(next(keys), (cfg.rel_buckets, h), dtype) * 0.1,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (
            jax.random.normal(next(keys), (d, cfg.vocab_size), dtype)
            * (0.4 / math.sqrt(d))
        )
    return params


def quantize_seq2seq_rtn(params: Params, cfg: Seq2SeqConfig, spec, pack=True) -> Params:
    """RTN-quantize every stacked linear (same storage as the decoder-only
    trunk — QuantizedTensor leaves served by qlinear); embeddings, norms
    and relative-bias tables stay dense."""
    from ..quant.qtensor import quantize_rtn

    out = dict(params)
    for side in ("enc", "dec"):
        qlayers: Dict[str, Any] = {}
        for name, w in params[side]["layers"].items():
            if name.startswith("ln"):
                qlayers[name] = w
                continue
            # uniform shapes across the stack: quantize per layer, stack
            # the QuantizedTensor leaves back along the scan axis
            per = [quantize_rtn(w[i], spec, pack=pack) for i in range(w.shape[0])]
            qlayers[name] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per)
        out[side] = {"layers": qlayers}
    # lm_head (untied checkpoints) stays fp — reference parity keeps the
    # head unquantized (`/root/reference/quant/omniquant.py` skips it)
    return out


# ----------------------------------------------------------------------
# Incremental (KV-cached) decoding — O(T) greedy instead of the O(T^2)
# re-forward fallback above. Cross-attention K/V are computed ONCE from
# the encoder output; decoder self-attention K/V append into a
# preallocated buffer (same design as the decoder-only trunk's cache —
# not the reference's torch.cat anti-pattern).


def init_seq2seq_state(
    params: Params,
    enc_toks: jax.Array,  # [B, S]
    max_new: int,
    cfg: Seq2SeqConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
) -> Dict[str, jax.Array]:
    """Encode + precompute cross K/V; allocate the decoder self cache."""
    b, s = enc_toks.shape
    h, dk = cfg.num_heads, cfg.d_kv
    enc_mask = _pad_mask(enc_toks, cfg.pad_token_id)
    enc_h = encode(params, enc_toks, cfg, rq, enc_mask)

    def cross_kv(lp):
        ck = qlinear(enc_h, lp["ck"], None, rq.act).reshape(b, s, h, dk)
        cv = qlinear(enc_h, lp["cv"], None, rq.act).reshape(b, s, h, dk)
        return ck, cv

    ck, cv = jax.lax.map(cross_kv, params["dec"]["layers"])  # [L, B, S, H, dk]
    L = ck.shape[0]
    return {
        "enc_h": enc_h,
        "enc_mask": enc_mask,
        "cross_k": ck,
        "cross_v": cv,
        "self_k": jnp.zeros((L, b, max_new + 1, h, dk), enc_h.dtype),
        "self_v": jnp.zeros((L, b, max_new + 1, h, dk), enc_h.dtype),
    }


def decode_step_seq2seq(
    params: Params,
    state: Dict[str, jax.Array],
    tok: jax.Array,  # [B, 1]
    pos,  # scalar int32: decoder position of `tok`
    cfg: Seq2SeqConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One decoder step over the cached state -> (logits [B, 1, V], state)."""
    b = tok.shape[0]
    h, dk = cfg.num_heads, cfg.d_kv
    t_max = state["self_k"].shape[2]
    x = jnp.asarray(params["shared"])[tok]  # [B, 1, D]
    eps = cfg.layer_norm_eps
    # relative bias column for a query at `pos` vs keys 0..t_max-1
    mem = jnp.arange(t_max)[None, :]
    buckets = _relative_position_bucket(
        mem - pos, False, cfg.rel_buckets, cfg.rel_max_distance
    )[0]  # [t_max]
    bias = jnp.transpose(params["dec_rel"][buckets], (1, 0))[None, :, None, :]
    causal = jnp.where(mem <= pos, 0.0, -1e9).astype(jnp.float32)[None, None]
    self_bm = bias.astype(jnp.float32) + causal  # [1, H, 1, T]

    def body(hc, xs):
        lp, ck_l, cv_l, sk_l, sv_l = xs
        xa = _rms(lp["ln1"], hc, eps)
        q = qlinear(xa, lp["q"], None, rq.act).reshape(b, 1, h, dk)
        k = qlinear(xa, lp["k"], None, rq.act).reshape(b, 1, h, dk)
        v = qlinear(xa, lp["v"], None, rq.act).reshape(b, 1, h, dk)
        sk_l = jax.lax.dynamic_update_slice(sk_l, k, (0, pos, 0, 0))
        sv_l = jax.lax.dynamic_update_slice(sv_l, v, (0, pos, 0, 0))
        s = jnp.einsum("bshd,bthd->bhst", q, sk_l).astype(jnp.float32) + self_bm
        p = jax.nn.softmax(s, axis=-1).astype(hc.dtype)
        o = jnp.einsum("bhst,bthd->bshd", p, sv_l).reshape(b, 1, h * dk)
        hc = hc + qlinear(o, lp["o"], None, rq.act)

        xc = _rms(lp["ln2"], hc, eps)
        qc = qlinear(xc, lp["cq"], None, rq.act).reshape(b, 1, h, dk)
        sc = jnp.einsum("bshd,bthd->bhst", qc, ck_l).astype(jnp.float32)
        sc = sc + state["enc_mask"]
        pc = jax.nn.softmax(sc, axis=-1).astype(hc.dtype)
        oc = jnp.einsum("bhst,bthd->bshd", pc, cv_l).reshape(b, 1, h * dk)
        hc = hc + qlinear(oc, lp["co"], None, rq.act)

        xm = _rms(lp["ln3"], hc, eps)
        hc = hc + _t5_mlp(lp, xm, cfg, rq)
        return hc, (sk_l, sv_l)

    hval, (sk, sv) = jax.lax.scan(
        body, x,
        (params["dec"]["layers"], state["cross_k"], state["cross_v"],
         state["self_k"], state["self_v"]),
    )
    state = dict(state, self_k=sk, self_v=sv)
    hval = _rms(params["dec_ln"], hval, eps)
    if cfg.tie_word_embeddings:
        hval = hval * (cfg.d_model ** -0.5)
        logits = jnp.einsum("btd,vd->btv", hval, jnp.asarray(params["shared"]))
    else:
        logits = qlinear(hval, params["lm_head"], None, rq.act)
    return logits, state


def greedy_generate_seq2seq_cached(
    params: Params,
    enc_toks: jax.Array,  # [B, S]
    n_steps: int,
    cfg: Seq2SeqConfig,
    rq: RuntimeQuantConfig = NO_QUANT,
) -> jax.Array:  # [B, n_steps]
    """O(T) greedy decode over the cached state (one encoder pass, one
    cross-K/V projection, per-step self-cache appends)."""
    b = enc_toks.shape[0]
    state = init_seq2seq_state(params, enc_toks, n_steps, cfg, rq)
    tok0 = jnp.full((b, 1), cfg.decoder_start_token_id, jnp.int32)

    def body(carry, i):
        tok, state = carry
        logits, state = decode_step_seq2seq(params, state, tok, i, cfg, rq)
        nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
        return (nxt[:, None], state), nxt

    (_, _), toks = jax.lax.scan(body, (tok0, state), jnp.arange(n_steps))
    return toks.T
