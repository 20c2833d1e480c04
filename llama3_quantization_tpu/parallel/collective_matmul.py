"""Collective matmuls — comm/compute-overlapped TP building blocks.

The Megatron-style TP block is bracketed by an all-gather (sequence-sharded
activations → column-parallel matmul) and a reduce-scatter (row-parallel
matmul → sequence-sharded output). Issued as monolithic collectives these
serialize with the MXU; the collective-matmul formulation decomposes each
into P ring steps — `ppermute` one chunk while the MXU multiplies the chunk
already on hand — so ICI transfer hides behind compute (the "overlap
collectives with the quantized matmuls" design obligation, SURVEY.md §7.7;
cf. Wang et al., "Overlap communication with dependent computation via
decomposition", ASPLOS'23 — the technique XLA's async collective scheduler
applies to these loops).

Both functions run inside `shard_map` with `axis_name` bound. Weights may
be `QuantizedTensor` shards — the inner product goes through `qmatmul`, so
the fused dequant path overlaps with the ring traffic.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.matmul import qmatmul
from ..quant.qtensor import QuantizedTensor


def _localize(w):
    """Inside `shard_map` a QuantizedTensor's array leaves are the local
    shard but its static k/n still describe the full tensor; rewrite them
    from the shard shapes. Column shards work packed or unpacked (n from
    the per-column scale); row (K) shards must be unpacked."""
    if not isinstance(w, QuantizedTensor):
        return w
    n_local = w.scale.shape[-1]
    k_local = w.k if w.packed else w.data.shape[0]
    if (n_local, k_local) == (w.n, w.k):
        return w
    return dataclasses.replace(w, n=n_local, k=k_local)


def ag_matmul(x_local: jax.Array, w_local, axis_name: str = "tp") -> jax.Array:
    """All-gather matmul: `x` sharded on its row (e.g. sequence) axis,
    `w_local` the full-K column shard `[K, N/P]` → returns the FULL-row
    output `[S, N/P]` without a monolithic all-gather.

    Ring schedule: at step r, multiply the row chunk currently held (the
    one that originated `my-r` hops upstream) and write it to its home
    slice of the output while the chunk ppermutes onward.
    """
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    s_loc = x_local.shape[0]
    w_local = _localize(w_local)
    n_out = w_local.n if hasattr(w_local, "n") else w_local.shape[1]
    perm = [(i, (i + 1) % p) for i in range(p)]

    def step(r, carry):
        out, chunk = carry
        src = (my - r) % p  # chunk held at step r originated on device src
        y = qmatmul(chunk, w_local)
        out = jax.lax.dynamic_update_slice_in_dim(out, y, src * s_loc, axis=0)
        chunk = jax.lax.ppermute(chunk, axis_name, perm)
        return out, chunk

    out0 = jnp.zeros((s_loc * p, n_out), x_local.dtype)
    out, _ = jax.lax.fori_loop(0, p, step, (out0, x_local))
    return out


def rs_matmul(x_full: jax.Array, w_local, axis_name: str = "tp") -> jax.Array:
    """Reduce-scatter matmul: `x_full` `[S, K/P]` (each device its K shard),
    `w_local` the row shard `[K/P, N]` → returns the sequence-sharded summed
    output `[S/P, N]` without a monolithic reduce-scatter.

    Ring schedule: a partial-sum chunk circulates; each step adds the local
    contribution for the chunk's home row block, so after P steps every
    device holds the fully-reduced block it owns.

    Quantized row shards must keep whole scale groups per device:
    `(K / P) % group_size == 0`.
    """
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    s = x_full.shape[0]
    s_loc = s // p
    w_local = _localize(w_local)
    perm = [(i, (i + 1) % p) for i in range(p)]

    def local_block(idx):
        xb = jax.lax.dynamic_slice_in_dim(x_full, idx * s_loc, s_loc, axis=0)
        return qmatmul(xb, w_local)

    def step(r, acc):
        # the accumulator visiting this device at step r originated r hops
        # upstream and owns that origin's row block; after p hops (a full
        # circle) it is home with every device's contribution added
        home = (my - r) % p
        acc = acc + local_block(home)
        return jax.lax.ppermute(acc, axis_name, perm)

    n_out = w_local.n if hasattr(w_local, "n") else w_local.shape[1]
    acc0 = jnp.zeros((s_loc, n_out), jnp.promote_types(x_full.dtype, jnp.float32))
    acc = jax.lax.fori_loop(0, p, step, acc0)
    return acc.astype(x_full.dtype)
