"""Device mesh construction (dp × tp over ICI; DCN axis for multi-host)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: tp = all devices, dp = 1.

    On a multi-host pod slice this is called after
    `jax.distributed.initialize()` with the global device list; the
    dp axis should then map to the DCN (inter-host) dimension and tp to ICI,
    which `mesh_utils.create_device_mesh` arranges for when sizes align with
    the physical topology.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None and dp is None:
        dp, tp = 1, n
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))
