"""Multi-device scaling benchmark.

Measures sharded-forward throughput at increasing device counts on one
mesh-capable host (virtual CPU devices in tests, chips on a pod slice) and
reports scaling efficiency vs the single-device rate — the harness behind
the ≥85%-at-1-chip/1-host/N-hosts target (BASELINE.json north star).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import ModelConfig
from ..parallel import make_mesh, make_sharded_forward, shard_params


def measure_scaling(
    params,
    cfg: ModelConfig,
    device_counts: Sequence[int] = (1, 2, 4, 8),
    batch_per_device: int = 2,
    seq: int = 128,
    iters: int = 5,
    tp_per_group: Optional[int] = None,
) -> Dict[int, dict]:
    """For each n in device_counts: shard over (dp=n/tp, tp) and measure
    full-sequence forward tokens/sec. Batch scales with n (weak scaling)."""
    results: Dict[int, dict] = {}
    base_rate = None
    for n in device_counts:
        devices = jax.devices()[:n]
        if len(devices) < n:
            break
        tp = min(tp_per_group or n, n)
        mesh = make_mesh(dp=n // tp, tp=tp, devices=devices)
        sharded = shard_params(params, mesh, cfg)
        fwd = make_sharded_forward(cfg, mesh)
        batch = batch_per_device * (n // tp)
        toks = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, (batch, seq)), jnp.int32
        )
        out = fwd(sharded, toks)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # force completion
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(sharded, toks)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        rate = batch * seq / dt
        if base_rate is None:
            base_rate = rate / n  # per-device rate at the first count
        results[n] = {
            "tok_s": round(rate, 1),
            "tok_s_per_device": round(rate / n, 1),
            "efficiency": round(rate / (base_rate * n), 4),
            "mesh": dict(mesh.shape),
        }
    return results
