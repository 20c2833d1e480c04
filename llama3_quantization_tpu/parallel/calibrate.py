"""Distributed calibration: GPTQ sharded over the device mesh.

The reference calibrates on exactly one GPU (`/root/reference/llama.py:
32-187` pins `dev`; `quant/omniquant.py:195-338` walks layers on one
device). Both halves of GPTQ parallelize naturally on a TPU mesh:

- the **solve** is embarrassingly parallel over output channels — every
  column of `W [K, N]` quantizes against the SAME Hessian with its own
  scales/zeros and error feedback, so sharding N over `tp` runs
  `gptq_solve` on N/tp-wide slabs with zero communication and bit-identical
  results (verified in tests/test_sharding.py);
- the **Hessian accumulation** is a sum of per-sample outer products, so
  sharding the calibration batch over `dp` computes partial `xᵀx` per
  device and one `psum` (exact: addition is the collective).

A 70B-scale calibration therefore scales near-linearly with chips: the
biggest solve (down_proj, 0.58 s on one v5e) splits its N=8192..28672
columns across the mesh, and the 128-sample Hessian stream splits its
batches.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.gptq import HessianState, gptq_solve
from ..quant.qtensor import QuantizedTensor, from_codes
from ..quant.quantizer import QuantSpec


def sharded_gptq_quantize_weight(
    w_kn: jax.Array,  # [K, N]
    H: jax.Array,  # [K, K], replicated
    spec: QuantSpec,
    mesh: Mesh,
    axis: str = "tp",
    blocksize: int = 128,
    percdamp: float = 0.01,
    pack: bool = False,
):
    """GPTQ-quantize `w_kn` with its output-channel axis sharded over
    `mesh[axis]`. Bit-identical to the single-device solve (columns are
    independent given H). Returns (QuantizedTensor sharded on N, err)."""
    n = w_kn.shape[1]
    nd = mesh.shape[axis]
    if n % nd:
        raise ValueError(f"N={n} not divisible by mesh axis {axis}={nd}")
    # place inputs on THIS mesh (H may arrive from a differently-shaped
    # calibration mesh, e.g. the dp Hessian mesh)
    w_kn = jax.device_put(w_kn, NamedSharding(mesh, P(None, axis)))
    H = jax.device_put(H, NamedSharding(mesh, P(None, None)))

    def local(w_local, H):
        codes, scales, zeros, _g_idx, err = gptq_solve(
            w_local.T,
            H,
            n_bits=spec.n_bits,
            group_size=spec.group_size,
            blocksize=blocksize,
            sym=spec.symmetric or spec.disable_zero_point,
            percdamp=percdamp,
        )
        # per-shard losses sum to the full-matrix loss (row-separable)
        err = jax.lax.psum(err, axis)
        return codes.T, scales.T, zeros.T, err

    codes, scales, zeros, err = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, None)),
            out_specs=(P(None, axis), P(None, axis), P(None, axis), P()),
            check_vma=False,  # lax.cond inside gptq_solve mixes vma types
        )
    )(w_kn, H)
    qt = from_codes(
        codes,
        scales,
        zeros,
        spec,
        pack=pack,
        out_dtype=w_kn.dtype if jnp.issubdtype(w_kn.dtype, jnp.floating) else jnp.bfloat16,
    )
    return qt, err


def sharded_hessian_update(
    state: HessianState,
    x: jax.Array,  # [B, T, K], B sharded over `axis`
    mesh: Mesh,
    axis: str = "dp",
) -> HessianState:
    """One Hessian batch update with the sample axis sharded over the mesh:
    per-device partial xᵀx + one psum — exact (same math as the streaming
    single-device `hessian_update`)."""
    if x.ndim == 2:
        x = x[None]
    b = x.shape[0]
    new_n = state.nsamples + b
    old_n = float(state.nsamples)

    def local(H, x_local):
        x2d = x_local.reshape(-1, x_local.shape[-1]).astype(jnp.float32)
        xf = x2d * jnp.sqrt(2.0 / new_n)
        part = jax.lax.psum(xf.T @ xf, axis)
        return H * (old_n / new_n) + part

    H = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, None), P(axis, None, None)),
            out_specs=P(None, None),
            check_vma=False,
        )
    )(state.H, x)
    return HessianState(H=H, nsamples=new_n)
