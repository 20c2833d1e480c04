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

METHODS = ("rtn", "gptq", "awq", "smoothquant", "hqq", "omniquant", "irqlora", "mixed")


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

    from .models.seq2seq import Seq2SeqConfig

    if isinstance(cfg, Seq2SeqConfig):
        # the encoder-decoder trunk supports rtn + gptq (round 5); the
        # remaining algorithms are decoder-only surface
        if method == "rtn":
            from .models.seq2seq import quantize_seq2seq_rtn

            return quantize_seq2seq_rtn(params, cfg, spec, pack=pack)
        if method == "gptq":
            from .quant.seq2seq_calibration import (
                gptq_quantize_seq2seq,
                split_calib_pairs,
            )

            if isinstance(calib_tokens, tuple):
                enc_t, dec_t = calib_tokens
            else:
                enc_t, dec_t = split_calib_pairs(calib_tokens)
            return gptq_quantize_seq2seq(
                params, cfg, enc_t, dec_t, spec, pack=pack, **kwargs
            )
        raise ValueError(
            f"seq2seq supports methods ('rtn', 'gptq'); got {method!r}"
        )

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
    if method == "irqlora":
        from .quant.irqlora import irqlora_quantize_model

        # NF4 codebook + ICQ tau search; spec's bit width is fixed at 4 by
        # the codebook, so `spec` is ignored (reference loads NF4 via bnb)
        return irqlora_quantize_model(params, cfg, **kwargs)
    if method == "mixed":
        from .quant.mixed import mixed_precision_gptq

        if calib_tokens is None:
            raise ValueError("method 'mixed' requires calib_tokens")
        upgrade = kwargs.pop("upgrade_spec", None) or dataclasses_replace_bits(spec, 8)
        out, upgraded = mixed_precision_gptq(
            params, cfg, calib_tokens, spec, upgrade, **kwargs
        )
        if upgraded:
            import sys

            print(f"[mixed] upgraded: {sorted(upgraded)}", file=sys.stderr)
        return out
    raise ValueError(f"unknown method {method!r}; choose from {METHODS}")


def dataclasses_replace_bits(spec: QuantSpec, bits: int) -> QuantSpec:
    import dataclasses

    return dataclasses.replace(spec, n_bits=bits)
