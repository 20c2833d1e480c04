"""Quantization core: pure-JAX quantizer math and quantized-tensor containers.

Mirrors the capability surface of the reference's `quant/` package
(`/root/reference/quant/quantizer.py`, `int_linear.py`, `int_matmul.py`)
but as functional transforms over arrays/pytrees instead of nn.Module swaps.
"""

from .quantizer import (  # noqa: F401
    CLIPMIN,
    QuantSpec,
    round_ste,
    minmax_scale_zp,
    fake_quant,
    fake_quant_dynamic,
    lwc_init,
)
from .qtensor import QuantizedTensor, quantize_rtn, dequantize  # noqa: F401
from .pack import pack_subbyte, unpack_subbyte  # noqa: F401
