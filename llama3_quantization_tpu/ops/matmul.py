"""Quantized matmul dispatch.

Replaces the reference's `QuantLinear`/`QuantMatMul` modules
(`/root/reference/quant/int_linear.py:48-65`, `quant/int_matmul.py:31-43`)
with functions. Two execution backends for quantized weights:

- "xla":    dequantize codes -> bf16 then `x @ W`. XLA fuses the int->float
            convert + scale into the matmul read; this is the correctness
            reference and the fallback on CPU.
- "pallas": fused dequant-matmul TPU kernel (`ops/pallas_qmatmul.py`) that
            streams packed bytes from HBM and unpacks in VMEM — the TPU
            equivalent of AutoGPTQ's qlinear_cuda (SURVEY.md §2.6 item 1).

The backend is a process-global knob (not a pytree field) so the same param
pytree runs anywhere.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.qtensor import QuantizedTensor, dequantize
from ..quant.quantizer import QuantSpec, fake_quant_dynamic

_BACKEND = "xla"


def set_backend(name: str) -> None:
    """Select the quantized-matmul execution backend.

    The knob is read at TRACE time: jitted functions capture the backend
    active at their first call, and jax's compilation cache is keyed only
    on argument shapes — so a decode/serving function traced under one
    backend keeps that path even if `set_backend` changes afterwards. Set
    the backend once at startup, before any jitted model call (the CLI and
    bench do); use the `backend(...)` context manager for scoped switches
    in tests, where each distinct call signature retraces anyway."""
    global _BACKEND
    if name not in ("xla", "pallas", "a8", "s4"):
        raise ValueError(name)
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


@contextlib.contextmanager
def backend(name: str):
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev


_A8_PACKED_WARNED = False


def prepare_decode_params(tree):
    """Hoist the s4 container->int4 conversion out of decode loops.

    Under the "s4" backend, rewrite every 4-bit QuantizedTensor leaf into a
    decode-prepared `S4Weight` (int4 codes + pre-multiplied zero scale).
    MUST be called in-jit BEFORE the token scan: the layer stack is itself
    a `lax.scan` over stacked leaves and XLA does not hoist the unpack
    chain across the nested scans (measured 52.8 vs 95+ tok/s). A no-op
    under every other backend."""
    if _BACKEND != "s4":
        return tree
    from .s4_matmul import prepare_s4

    def fix(leaf):
        if isinstance(leaf, QuantizedTensor) and leaf.bits <= 4 and leaf.g_idx is None:
            return prepare_s4(leaf)
        return leaf

    return jax.tree_util.tree_map(
        fix, tree, is_leaf=lambda l: isinstance(l, QuantizedTensor)
    )


def qmatmul(x: jax.Array, w, out_dtype=None) -> jax.Array:
    """`x @ w` where `w` is a jax.Array, QuantizedTensor, or S4Weight."""
    from .s4_matmul import S4Weight

    if isinstance(w, S4Weight):
        from .s4_matmul import s4w_matmul

        return s4w_matmul(x, w, out_dtype=out_dtype)
    if isinstance(w, QuantizedTensor):
        if w.g_idx is not None:
            # act-order grouping: non-contiguous column→group map — only the
            # gather-dequant path understands it
            wd = dequantize(w)
            return jnp.matmul(x.astype(wd.dtype), wd).astype(out_dtype or x.dtype)
        if _BACKEND == "s4":
            # true 4-bit HBM bytes via XLA's native int4 MXU path; 8-bit
            # tensors (e.g. the s8 lm_head recode) ride the a8 dot
            if w.bits <= 4:
                from .s4_matmul import s4_matmul

                return s4_matmul(x, w, out_dtype=out_dtype)
            if not w.packed:
                from .a8_matmul import a8_matmul

                return a8_matmul(x, w, out_dtype=out_dtype)
        if _BACKEND == "a8" and not w.packed:
            from .a8_matmul import a8_matmul

            return a8_matmul(x, w, out_dtype=out_dtype)
        if _BACKEND == "a8" and w.packed:
            # packed storage cannot ride the native s8 dot; make the silent
            # 3-6x-slower dequant fallback visible once
            global _A8_PACKED_WARNED
            if not _A8_PACKED_WARNED:
                _A8_PACKED_WARNED = True
                import warnings

                warnings.warn(
                    "a8 backend with PACKED weights: falling back to the XLA "
                    "dequant path — recode with quant.serving.recode_model_s8 "
                    "(unpacked s8 containers) for the native MXU path",
                    stacklevel=2,
                )
        if (
            _BACKEND == "pallas"
            and x.ndim >= 2
            and w.zero is not None  # kernel requires zero-point storage
        ):
            # zero-free (symmetric / serving recode) tensors fall through
            # to the XLA dequant path
            from .pallas_qmatmul import fused_dequant_matmul

            return fused_dequant_matmul(x, w, out_dtype=out_dtype)
        wd = dequantize(w)
        return jnp.matmul(x.astype(wd.dtype), wd).astype(out_dtype or x.dtype)
    return jnp.matmul(x, w.astype(x.dtype)).astype(out_dtype or x.dtype)


def qlinear(
    x: jax.Array,
    w,
    bias: Optional[jax.Array] = None,
    act_spec: Optional[QuantSpec] = None,
) -> jax.Array:
    """Linear layer with optional dynamic activation fake-quant on the input
    (the reference's `QuantLinear.forward` input path,
    `quant/int_linear.py:55-60`)."""
    if act_spec is not None and act_spec.enabled:
        x = fake_quant_dynamic(x, act_spec)
    y = qmatmul(x, w)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
