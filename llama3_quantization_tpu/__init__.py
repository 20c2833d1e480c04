"""llama3_quantization_tpu — a TPU-native low-bit LLM quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
SilviaUvA/LLaMA3-Quantization (arXiv:2404.14047 companion code):

- uniform affine fake/real quantization (RTN), GPTQ, AWQ, SmoothQuant,
  OmniQuant (LWC/LET), HQQ, NF4/IR-QLoRA
- packed int2/3/4/8 weight formats with Pallas fused dequant-matmul kernels
- functional Llama-3 / OPT model definitions with quantized KV cache
- GSPMD tensor/data-parallel sharding over a `jax.sharding.Mesh`
- an lm-eval-style evaluation harness (perplexity + zero-shot tasks)

The reference is module-swapping + eager fake-quant over torch models; this
framework instead treats quantization as **pure transforms over parameter
pytrees** and execution as jitted, mesh-sharded programs.
"""

__version__ = "0.1.0"

from . import quant  # noqa: F401
