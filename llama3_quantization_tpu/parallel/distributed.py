"""Multi-host (pod-slice) runtime setup.

The reference has no distributed backend at all (SURVEY.md §2.7: zero
`torch.distributed`/NCCL occurrences); its "multi-GPU" is single-process
layer placement. The TPU-native equivalent: every host runs the same SPMD
program, `jax.distributed.initialize` wires the processes, and one global
mesh spans DCN (inter-host) × ICI (intra-host) axes. Weight/KV shardings
from `sharding.py` then apply unchanged — dp on the DCN axis, tp on ICI —
and XLA's collectives ride the right fabric because the hybrid mesh keeps
ICI-connected devices contiguous on the inner axis.

Untestable on this single-chip environment beyond the virtual CPU mesh;
the API mirrors standard JAX multi-host usage so a pod run is:

    from llama3_quantization_tpu.parallel.distributed import (
        init_distributed, make_pod_mesh)
    init_distributed()                   # env-driven on TPU pods
    mesh = make_pod_mesh(tp=8)           # tp over ICI, dp over hosts
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` wrapper; on Cloud TPU pods all args are
    discovered from the environment."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_pod_mesh(tp: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """Global (dp, tp) mesh over all processes' devices.

    Defaults: tp = devices per host (ICI domain), dp = number of hosts
    (DCN). Uses `create_hybrid_device_mesh` so the tp axis stays inside
    each host's ICI domain — all-reduces from tensor parallelism never
    cross DCN.
    """
    from jax.experimental import mesh_utils

    n_local = jax.local_device_count()
    n_total = jax.device_count()
    tp = tp or n_local
    dp = dp or n_total // tp
    if dp * tp != n_total:
        raise ValueError(f"dp({dp}) * tp({tp}) != global devices ({n_total})")
    if n_total > n_local:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp // (n_total // n_local) or 1, tp),
            dcn_mesh_shape=(n_total // n_local, 1),
            # granule = process: dp maps to hosts (the DCN boundary we
            # schedule around) whether or not the platform reports
            # slice_index (CPU meshes in the localhost smoke run don't)
            process_is_granule=True,
        )
    else:
        devices = mesh_utils.create_device_mesh((dp, tp))
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))
