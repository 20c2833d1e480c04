"""Ring attention — sequence parallelism over an `sp` mesh axis.

The reference pins sequence length at 2048 and materializes the full L×L
score matrix in eager mode (`/root/reference/main.py:312`,
`models/int_llama_layer.py:143-163`); long-context evaluation is simply
out of its reach. Here the sequence axis itself is sharded: each device
holds S/sp tokens, computes attention of its local queries against KV
blocks that travel the ring (`ppermute`) once around the mesh, and merges
partial results with the online-softmax (flash) recurrence — so the score
matrix never exceeds [S/sp × S/sp] per device and context length scales
linearly with the mesh.

`make_sp_forward` runs the full pre-norm decoder trunk under this scheme
(activations sequence-sharded everywhere; attention is the only
cross-device exchange), giving long-context PPL the reference cannot
compute. Causality across blocks falls out of block ordering: block j of
the sequence may attend block i fully iff i < j, intra-block uses the
usual causal mask, and future blocks are masked away.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.configs import ModelConfig
from ..models.transformer import (
    NO_QUANT,
    RuntimeQuantConfig,
    _norm,
    decoder_layer,
    lm_head,
    rope_cos_sin,
)

_NEG = -1e30  # finite mask: keeps the online-softmax recurrence NaN-free


def ring_attention(
    q: jax.Array,  # [B, S_loc, H, D] (local shard, already RoPE'd)
    k: jax.Array,  # [B, S_loc, Hkv, D]
    v: jax.Array,  # [B, S_loc, Hkv, D]
    axis_name: str = "sp",
    rq: RuntimeQuantConfig = NO_QUANT,
) -> jax.Array:
    """Causal blockwise attention with KV blocks rotating around the ring.

    Must run inside `shard_map` with `axis_name` bound. GQA via the same
    head-group einsum as the eager path; fp32 accumulation. All four eager
    fake-quant hooks apply (`int_llama_layer.py:141-163`): q/k/v are
    quantized per local shard (their reduction axis is token-local), and
    the probs hook (`rq.p`) — whose per-token statistics span the whole
    key axis — runs as a second ring pass: pass 1 collects the exact
    per-row (max, min, denominator) online, pass 2 materializes each
    block's normalized probs, quantizes them with the globally-correct
    scale (max prob = 1/l, min prob = exp(min_score - m)/l), and
    accumulates PV. Grouped p-specs are supported when the ring block width
    is a multiple of group_size (groups then never straddle blocks and
    their dynamic min/max is block-local == globally exact); LWC p-specs
    are not supported.
    """
    from ..models.transformer import _maybe_fq

    q = _maybe_fq(q, rq.q)
    k = _maybe_fq(k, rq.k)
    v = _maybe_fq(v, rq.v)
    b, s, h, d = q.shape
    g = k.shape[2]
    rep = h // g
    sp = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    qg = q.reshape(b, s, g, rep, d).astype(jnp.float32)
    scale = 1.0 / math.sqrt(d)

    qi = jnp.arange(s)[:, None]
    kj = jnp.arange(s)[None, :]
    intra = jnp.where(kj <= qi, 0.0, _NEG).astype(jnp.float32)
    zeros_m = jnp.zeros_like(intra)
    neg_m = jnp.full_like(intra, _NEG)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def step(r, carry):
        acc, m, l, kb, vb = carry
        # after r hops each device holds the block that originated at my-r
        blk = (my - r) % sp
        scores = (
            jnp.einsum(
                "bsgrd,btgd->bgrst", qg, kb.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        msk = jnp.where(blk == my, intra, jnp.where(blk < my, zeros_m, neg_m))
        scores = scores + msk
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "bgrst,btgd->bgrsd", p, vb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha[..., None] + pv
        kb, vb = jax.lax.ppermute((kb, vb), axis_name, perm)
        return acc, m_new, l, kb, vb

    if rq.p is not None and rq.p.enabled:
        if rq.p.lwc:
            raise NotImplementedError(
                "LWC on the p-spec is not supported under ring attention"
            )
        if rq.p.group_size and s % rq.p.group_size:
            raise NotImplementedError(
                f"grouped rq.p needs the ring block width ({s}) to be a "
                f"multiple of group_size ({rq.p.group_size}) so groups do "
                "not straddle ring blocks"
            )
        out = _two_pass_pv(qg, k, v, intra, zeros_m, neg_m, my, sp, perm,
                           scale, axis_name, rq.p)
        return (
            jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(b, s, h, d).astype(q.dtype)
        )

    init = (
        jnp.zeros((b, g, rep, s, d), jnp.float32),
        jnp.full((b, g, rep, s), _NEG, jnp.float32),
        jnp.zeros((b, g, rep, s), jnp.float32),
        k,
        v,
    )
    acc, _, l, _, _ = jax.lax.fori_loop(0, sp, step, init)
    out = acc / l[..., None]
    # [b,g,rep,s,d] -> [b,s,h,d]
    return jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(b, s, h, d).astype(q.dtype)


def _two_pass_pv(qg, k, v, intra, zeros_m, neg_m, my, sp, perm, scale,
                 axis_name, p_spec):
    """Ring attention with the softmax-probs fake-quant hook.

    The single-device path quantizes the *normalized* prob row before PV
    (`/root/reference/models/int_llama_layer.py:161-163`); one online pass
    cannot reproduce that (the row max/denominator are only known at the
    end), so: pass 1 rotates K blocks collecting the exact row statistics
    (m = max score, mn = min score, l = Σexp(s-m)); pass 2 rotates K and V,
    recomputes each block's scores, forms exp(s-m)/l — the true normalized
    probs — quantizes with the per-token scale derived from
    (exp(mn-m)/l, 1/l), and accumulates PV with no final renormalization
    (quantized probs already sum to ≈1, exactly as the eager path). Costs a
    second ring rotation of K; opt-in via the p-spec.
    """
    from ..quant.quantizer import fake_quant, scale_zp_from_minmax

    b, s, g, rep, d = qg.shape

    def scores_for(r, kb):
        blk = (my - r) % sp
        sc = (
            jnp.einsum(
                "bsgrd,btgd->bgrst", qg, kb.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        msk = jnp.where(blk == my, intra, jnp.where(blk < my, zeros_m, neg_m))
        return sc + msk

    def stats_step(r, carry):
        m, mn, l, kb = carry
        sc = scores_for(r, kb)
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(sc - m_new[..., None]), axis=-1)
        mn = jnp.minimum(mn, jnp.min(sc, axis=-1))
        kb = jax.lax.ppermute(kb, axis_name, perm)
        return m_new, mn, l, kb

    stat_init = (
        jnp.full((b, g, rep, s), _NEG, jnp.float32),
        jnp.full((b, g, rep, s), -_NEG, jnp.float32),
        jnp.zeros((b, g, rep, s), jnp.float32),
        k,
    )
    m, mn, l, k = jax.lax.fori_loop(0, sp, stats_step, stat_init)

    if p_spec.metric == "fix0to1":
        levels = 2**p_spec.n_bits - 1
        quantize = lambda p: jnp.round(p * levels) / levels  # noqa: E731
    elif p_spec.group_size:
        # grouped minmax: the ring guard guarantees the block width is a
        # multiple of group_size, so every group lies inside one block and
        # its dynamic min/max is block-local == globally exact — plain
        # dynamic fake-quant of the normalized block reproduces the eager
        # hook with no extra statistics
        from ..quant.quantizer import fake_quant_dynamic

        quantize = lambda p: fake_quant_dynamic(p, p_spec)  # noqa: E731
    else:
        # masked entries underflow to prob 0 exactly, like the eager row
        pmin = (jnp.exp(mn - m) / l)[..., None]
        pmax = (1.0 / l)[..., None]
        p_scale, p_zp = scale_zp_from_minmax(pmin, pmax, p_spec)
        quantize = lambda p: fake_quant(p, p_scale, p_zp, p_spec)  # noqa: E731

    def pv_step(r, carry):
        acc, kb, vb = carry
        p = jnp.exp(scores_for(r, kb) - m[..., None]) / l[..., None]
        p = quantize(p)
        acc = acc + jnp.einsum(
            "bgrst,btgd->bgrsd", p, vb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        kb, vb = jax.lax.ppermute((kb, vb), axis_name, perm)
        return acc, kb, vb

    pv_init = (jnp.zeros((b, g, rep, s, d), jnp.float32), k, v)
    acc, _, _ = jax.lax.fori_loop(0, sp, pv_step, pv_init)
    return acc


def make_sp_forward(
    cfg: ModelConfig,
    mesh: Mesh,
    rq: RuntimeQuantConfig = NO_QUANT,
    return_hidden: bool = False,
):
    """jitted `fn(params, tokens) -> logits` (or final hidden states with
    `return_hidden`, for chunked-lm_head consumers like the PPL loop) with
    the sequence axis sharded over `sp`. Params replicated (combine with
    tp/pp at larger scale); pre-norm (llama/mixtral) architectures.

    Requirements: `tokens.shape[1] % sp == 0`.
    """
    if cfg.parallel_block or not cfg.uses_rope:
        raise NotImplementedError("sp forward supports pre-norm RoPE archs")
    if rq.p is not None and rq.p.enabled and rq.p.lwc:
        raise NotImplementedError(
            "LWC on the p-spec is not supported under ring attention"
        )  # grouped p-specs: block-width divisibility checked per call
    sp = mesh.shape["sp"]
    ring = partial(ring_attention, rq=rq)

    def trunk(params, tokens):  # per-device under shard_map
        my = jax.lax.axis_index("sp")
        b, s_loc = tokens.shape
        positions = my * s_loc + jnp.arange(s_loc)[None, :]  # absolute
        h = jnp.take(params["embed"], tokens, axis=0, mode="clip")
        cos_sin = rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, h.dtype, cfg.rope_scaling_)

        def body(hc, p):
            hc, _ = decoder_layer(
                p, hc, cfg, rq, cos_sin, mask=None, attn_impl=ring
            )
            return hc, None

        h, _ = jax.lax.scan(body, h, params["layers"])
        h = _norm(params["norm"], h, cfg)
        return h if return_hidden else lm_head(params, h, cfg)

    def repl_specs(params):
        return jax.tree_util.tree_map(lambda x: P(*([None] * x.ndim)), params)

    @jax.jit
    def fwd(params, tokens):
        inner = shard_map(
            trunk,
            mesh=mesh,
            in_specs=(repl_specs(params), P(None, "sp")),
            out_specs=P(None, "sp", None),
            check_vma=False,
        )
        return inner(params, tokens)

    return fwd
