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
from jax.experimental.shard_map import shard_map
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
    head-group einsum as the eager path; fp32 accumulation. The eager
    path's q/k/v fake-quant hooks apply (`int_llama_layer.py:141-163`);
    the probs hook (`rq.p`) cannot — probabilities only exist after the
    global online-softmax merge — and is rejected by `make_sp_forward`.
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
    if rq.p is not None:
        raise NotImplementedError(
            "rq.p (softmax-probs fake-quant) has no equivalent under the "
            "ring online-softmax merge; use the single-device path for it"
        )
    sp = mesh.shape["sp"]
    ring = partial(ring_attention, rq=rq)

    def trunk(params, tokens):  # per-device under shard_map
        my = jax.lax.axis_index("sp")
        b, s_loc = tokens.shape
        positions = my * s_loc + jnp.arange(s_loc)[None, :]  # absolute
        h = jnp.take(params["embed"], tokens, axis=0, mode="clip")
        cos_sin = rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, h.dtype)

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
            check_rep=False,
        )
        return inner(params, tokens)

    return fwd
