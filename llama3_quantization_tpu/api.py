"""Top-level convenience API: one entry point over the algorithm zoo.

The reference scatters method dispatch across driver scripts
(`main.py --quant_method`, `autogptq.py`, `quantizehqq.py`, `llama.py`);
here `quantize()` is the single typed dispatcher.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .models.configs import ModelConfig
from .quant.quantizer import QuantSpec

METHODS = ("rtn", "gptq", "awq", "smoothquant", "hqq", "omniquant")


def quantize(
    params,
    cfg: ModelConfig,
    method: str = "rtn",
    spec: Optional[QuantSpec] = None,
    calib_tokens: Optional[np.ndarray] = None,
    pack: bool = True,
    **kwargs: Any,
):
    """Quantize a model's decoder linears with the chosen algorithm.

    calib_tokens [n, S] is required for gptq/awq/smoothquant/omniquant.
    Extra kwargs flow to the algorithm (blocksize, alpha, epochs, iters...).
    """
    spec = spec or QuantSpec(n_bits=4, group_size=128)
    needs_calib = method in ("gptq", "awq", "smoothquant", "omniquant")
    if needs_calib and calib_tokens is None:
        raise ValueError(f"method {method!r} requires calib_tokens")

    if method == "rtn":
        from .models.params import quantize_model_rtn

        return quantize_model_rtn(params, cfg, spec, pack=pack)
    if method == "gptq":
        from .quant.calibration import gptq_quantize_model

        return gptq_quantize_model(params, cfg, calib_tokens, spec, pack=pack, **kwargs)
    if method == "awq":
        from .quant.awq import awq_quantize_model

        return awq_quantize_model(params, cfg, calib_tokens, spec, pack=pack, **kwargs)
    if method == "smoothquant":
        from .models.params import quantize_model_rtn
        from .quant.smoothquant import smoothquant_model

        smoothed = smoothquant_model(params, cfg, calib_tokens, **kwargs)
        return quantize_model_rtn(smoothed, cfg, spec, pack=pack)
    if method == "hqq":
        from .quant.hqq import hqq_quantize_model

        return hqq_quantize_model(params, cfg, spec, pack=pack, **kwargs)
    if method == "omniquant":
        import dataclasses

        from .quant.omniquant import OmniConfig, omniquant_model

        wspec = dataclasses.replace(spec, lwc=True)
        ocfg = OmniConfig(wspec=wspec, pack=pack, **kwargs)
        return omniquant_model(params, cfg, calib_tokens, ocfg)
    raise ValueError(f"unknown method {method!r}; choose from {METHODS}")
