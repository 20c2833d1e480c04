"""Observer-driven mixed-precision quantization.

The reference's `Observer` ranks layers by GPTQ proxy error so the worst
can be "upgraded" to more bits (`/root/reference/gptq.py:15-53`; the
`--observe` flow in `llama.py`). This module closes that loop natively:
GPTQ-quantize everything at the base width while recording per-linear
errors, then re-quantize the top-k worst linears at the upgrade width.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..models.configs import ModelConfig
from .calibration import gptq_quantize_model
from .gptq import Observer
from .quantizer import QuantSpec


def mixed_precision_gptq(
    params,
    cfg: ModelConfig,
    calib_tokens: np.ndarray,
    base_spec: QuantSpec,
    upgrade_spec: QuantSpec,
    topk: int = 4,
    **gptq_kwargs,
) -> Tuple[dict, Dict[str, float]]:
    """Returns (quantized params, {"layer.name": error} for upgraded ones).

    Two GPTQ passes: the base pass records errors through an Observer; the
    upgrade pass re-runs with a per-linear spec override for the top-k
    worst (everything else reuses the base result via the same
    deterministic pipeline).
    """
    if gptq_kwargs.get("pack"):
        raise ValueError(
            "mixed precision requires unpacked (int8-container) storage so "
            "upgraded codes graft into the same stacked tensor"
        )
    if upgrade_spec.group_size != base_spec.group_size:
        raise ValueError("base and upgrade specs must share group_size")
    base_zero = not (base_spec.symmetric or base_spec.disable_zero_point)
    up_zero = not (upgrade_spec.symmetric or upgrade_spec.disable_zero_point)
    if base_zero != up_zero:
        # the graft swaps data/scale/zero leaf-wise; a zero-point-presence
        # mismatch would silently drop (or crash on) the upgraded zeros
        raise ValueError(
            "base and upgrade specs must agree on zero-point presence "
            "(symmetric/disable_zero_point)"
        )
    from ..models.params import linear_names

    upgradable = set(linear_names(cfg))  # MoE expert pseudo-names excluded
    observer = Observer(topk=topk)
    errors: Dict[str, float] = {}

    def record(layer_idx, _total, errs):
        for name, err in errs.items():
            if name not in upgradable:
                continue
            observer.submit(name, layer_idx - 1, err)
            errors[f"{name}.{layer_idx - 1}"] = err

    base = gptq_quantize_model(
        params, cfg, calib_tokens, base_spec, progress=record, **gptq_kwargs
    )
    worst = {(name, lid) for name, lid, _ in observer.items()}
    if not worst or upgrade_spec.n_bits <= base_spec.n_bits:
        return base, {}

    # re-quantize the worst linears at the upgrade width from the ORIGINAL
    # fp weights, against Hessians implied by the same calibration stream:
    # simplest sound scheme — run a full upgrade-width pass and graft the
    # worst linears' tensors into the base result
    upgraded = gptq_quantize_model(
        params, cfg, calib_tokens, upgrade_spec, **gptq_kwargs
    )
    import jax

    # unpacked int8 codes are bits-agnostic at dequant time ((c - z) * s),
    # so upgraded layers swap in leaf-wise (the bits metadata differs, so
    # the data fields are grafted explicitly rather than via tree_map)
    import dataclasses as dc

    layers = dict(base["layers"])
    for name, lid in worst:
        entry = dict(layers[name])
        bw = entry["w"]
        uw = upgraded["layers"][name]["w"]
        entry["w"] = dc.replace(
            bw,
            data=bw.data.at[lid].set(uw.data[lid]),
            scale=bw.scale.at[lid].set(uw.scale[lid]),
            zero=None if bw.zero is None else bw.zero.at[lid].set(uw.zero[lid]),
        )
        layers[name] = entry
    out = dict(base)
    out["layers"] = layers
    upgraded_errs = {f"{n}.{l}": errors[f"{n}.{l}"] for n, l in worst}
    return out, upgraded_errs
