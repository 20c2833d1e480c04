"""GPTQ — Hessian-based weight quantization, as jitted JAX.

Re-implements the algorithm of the reference's `gptq.py` (GPTQ-for-LLaMa
vintage, `/root/reference/gptq.py:56-231`): streaming Hessian accumulation
`H = 2/n Σ x xᵀ`, damped Cholesky inverse, block-wise column-by-column
quantize with error feedback `W -= err · Hinv_row`, per-group scale/zero
re-estimation, optional activation-order permutation.

TPU-first formulation: the inherently sequential column loop becomes a
two-level `lax.fori_loop` (inner loop over a static 128-column block with
*masked* rank-1 updates, outer loop applying the rank-`blocksize` update to
the trailing columns), so the whole solve jits into one XLA program with
static shapes. Per-matrix cost is O(K²·N) bandwidth on the block updates —
the same blocked schedule the CUDA original uses.

The scale/zero finder matches GPTQ-for-LLaMa's `quant.Quantizer.find_params`
semantics (min clamped to ≤0, max to ≥0; degenerate all-zero rows mapped to
[-1, 1]; symmetric mode centers the grid), which differ from the OmniQuant
quantizer in `quantizer.py` — both are provided because score parity demands
each algorithm use its own grid convention.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .qtensor import QuantizedTensor, from_codes
from .quantizer import QuantSpec


class Observer:
    """Top-k worst-quantized-layer tracker (`/root/reference/gptq.py:15-53`):
    layers ranked by GPTQ proxy error, candidates for precision upgrades."""

    def __init__(self, topk: int = 32):
        self.loss_list: list = []
        self.topk = topk

    def submit(self, name: str, layerid: int, error: float) -> None:
        item = (name, layerid, error)
        if len(self.loss_list) < self.topk:
            self.loss_list.append(item)
            return
        min_idx = min(range(len(self.loss_list)), key=lambda i: self.loss_list[i][2])
        if error > self.loss_list[min_idx][2]:
            self.loss_list[min_idx] = item

    def items(self):
        return sorted(self.loss_list, key=lambda s: s[2], reverse=True)

    def table(self) -> str:
        rows = ["| layer | error |", "|---|---|"]
        rows += [f"| {n}.{l} | {e:.4f} |" for n, l, e in self.items()]
        return "\n".join(rows)


def snr_error(y_hat: jax.Array, y: jax.Array) -> float:
    """Noise-to-signal power ratio (the reference's `utils.torch_snr_error`,
    imported at `/root/reference/gptq.py:9` but missing in the fork — its
    SNR diagnostics are broken there; working here). Lower is better."""
    y_hat = y_hat.reshape(-1, y_hat.shape[-1]).astype(jnp.float32)
    y = y.reshape(-1, y.shape[-1]).astype(jnp.float32)
    noise = jnp.sum((y_hat - y) ** 2, axis=-1)
    signal = jnp.sum(y**2, axis=-1)
    return float(jnp.mean(noise / jnp.clip(signal, 1e-12, None)))


def fake_quant_int8_per_tensor(x: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 fake-quant of an activation — the input
    quantizer the reference's SNR probe uses (`gptq.py:111-116`,
    `Quantizer.configure(8, perchannel=False, sym=True)`)."""
    scale = jnp.clip(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12, None) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
    return (q * scale).astype(x.dtype)


def format_snr_table(rows) -> str:
    """Render SNR diagnostics rows as the reference's texttable layout
    (`gptq.py:101-126`: name | weight_error | fp_inp_SNR | q_inp_SNR | time)."""
    out = [
        "| name | weight_error | fp_inp_SNR | q_inp_SNR | time |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            "| {name} | {weight_error:.4f} | {fp_inp_snr:.6f} | {q_inp_snr:.6f} | {time:.2f}s |".format(**r)
        )
    return "\n".join(out)


# ---------------------------------------------------------------------------
# GPTQ-for-LLaMa grid finder
# ---------------------------------------------------------------------------


def gptq_find_params(
    w: jax.Array, n_bits: int, sym: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Per-row (scale, zero) over the given columns — GPTQ-for-LLaMa
    `Quantizer.find_params(..., weight=True)` semantics.

    w: [rows, cols] -> scale, zero: [rows]."""
    maxq = 2**n_bits - 1
    xmin = jnp.minimum(jnp.min(w, axis=1), 0.0)
    xmax = jnp.maximum(jnp.max(w, axis=1), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)
    return scale, zero


def _quantize_col(w, scale, zero, maxq):
    q = jnp.clip(jnp.round(w / scale) + zero, 0, maxq)
    return q, scale * (q - zero)


# ---------------------------------------------------------------------------
# Hessian accumulation (streaming over calibration batches)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HessianState:
    H: jax.Array  # [K, K] float32
    nsamples: int


def hessian_init(k: int) -> HessianState:
    return HessianState(H=jnp.zeros((k, k), jnp.float32), nsamples=0)


@partial(jax.jit, donate_argnums=(0,))
def _hessian_step(H, x2d, old_n, new_n):
    """H' = H * old_n/new_n + (2/new_n) x xᵀ (reference `add_batch`,
    `gptq.py:94-99`). H is donated — at K=14336 the old and new Hessian
    together would hold 1.6 GB."""
    xf = x2d.astype(jnp.float32) * jnp.sqrt(2.0 / new_n)
    return H * (old_n / new_n) + xf.T @ xf


def hessian_update(state: HessianState, x: jax.Array) -> HessianState:
    """x: [B, T, K] or [T, K] — one calibration batch; B counts as `B`
    samples (reference counts pre-flatten batch dim, `gptq.py:84`)."""
    if x.ndim == 2:
        x = x[None]
    b = x.shape[0]
    new_n = state.nsamples + b
    x2d = x.reshape(-1, x.shape[-1])
    H = _hessian_step(state.H, x2d, float(state.nsamples), float(new_n))
    return HessianState(H=H, nsamples=new_n)


# ---------------------------------------------------------------------------
# Cholesky plumbing
# ---------------------------------------------------------------------------
#
# XLA's CholeskyExpander fully unrolls an N² Cholesky into N/128
# constant-index iterations; at K=14336 (Llama-3 down_proj) the unrolled
# trailing-update temps stop aliasing and the program asks for 44.5 GB of
# HBM (measured — OOM on a 16 GB chip). The fori_loop formulation below
# keeps *dynamic* block indices so the whole factorization lives in one
# reused [K, K] buffer (~3 buffers peak ≈ 2.4 GB at K=14336).


def _chol_lower_blocked(A: jax.Array, block: int = 512) -> jax.Array:
    """Right-looking blocked lower Cholesky of an SPD [K, K] matrix via
    `lax.fori_loop` (dynamic indices — no expander unrolling). Requires
    `K % block == 0`; callers fall back to `lax.linalg.cholesky` otherwise."""
    k = A.shape[0]
    col = jnp.arange(k)

    def body(j, A):
        i0 = j * block
        D = jax.lax.dynamic_slice(A, (i0, i0), (block, block))
        Ld = jax.lax.linalg.cholesky(D)  # block² — expander temps negligible
        strip = jax.lax.dynamic_slice(A, (0, i0), (k, block))
        # panel rows below the diagonal block: strip @ Ld^-T
        pan = jax.lax.linalg.triangular_solve(
            Ld, strip, left_side=False, lower=True, transpose_a=True
        )
        below = (col >= i0 + block)[:, None]
        pan = jnp.where(below, pan, 0.0)
        # trailing Schur update touches only rows/cols >= i0+block because
        # pan is zeroed elsewhere
        A = A - pan @ pan.T
        # write the factored strip back: zeros above, Ld on the diagonal
        # block, panel below
        in_blk = ((col >= i0) & (col < i0 + block))[:, None]
        ld_full = jnp.zeros((k, block), A.dtype)
        ld_full = jax.lax.dynamic_update_slice(ld_full, Ld, (i0, 0))
        new_strip = jnp.where(below, pan, jnp.where(in_blk, ld_full, 0.0))
        return jax.lax.dynamic_update_slice(A, new_strip, (0, i0))

    A = jax.lax.fori_loop(0, k // block, body, A)
    return jnp.tril(A)


def _tri_inv_lower_blocked(L: jax.Array, block: int = 512) -> jax.Array:
    """L^-1 for lower-triangular [K, K] L via block forward substitution in
    a `lax.fori_loop`. XLA's TriangularSolveExpander unrolls a K×K solve
    into K/128 constant-index iterations whose trailing temps do not alias
    (44.9 GB at K=14336, measured); this keeps everything in one X buffer."""
    k = L.shape[0]
    col = jnp.arange(k)
    eyeb = jnp.eye(block, dtype=L.dtype)

    def body(i, X):
        i0 = i * block
        D = jax.lax.dynamic_slice(L, (i0, i0), (block, block))
        strip = jax.lax.dynamic_slice(L, (i0, 0), (block, k))
        strip = jnp.where(col[None, :] < i0, strip, 0.0)
        rhs = -(strip @ X)  # rows of X past i0 are still zero
        diag_blk = jax.lax.dynamic_slice(rhs, (0, i0), (block, block)) + eyeb
        rhs = jax.lax.dynamic_update_slice(rhs, diag_blk, (0, i0))
        Xi = jax.lax.linalg.triangular_solve(
            D, rhs, left_side=True, lower=True
        )
        return jax.lax.dynamic_update_slice(X, Xi, (i0, 0))

    return jax.lax.fori_loop(0, k // block, body, jnp.zeros_like(L))


def inv_cholesky_upper(Hd: jax.Array) -> jax.Array:
    """Upper-triangular U with `Hd^-1 = Uᵀ U` — what GPTQ's error feedback
    consumes (reference `gptq.py:164-167` computes it as
    cholesky(cholesky_inverse(cholesky(H)), upper=True)).

    Computed here WITHOUT forming Hd^-1, via the reversal identity: with
    P the index-reversal permutation and L = chol_lower(P Hd P),
    P L^-1 P is upper-triangular with positive diagonal and
    (P L^-1 P)ᵀ (P L^-1 P) = P L^-T L^-1 P = P (P Hd P)^-1 P = Hd^-1,
    so by uniqueness it IS that factor — one Cholesky + one triangular
    inverse instead of cholesky + 2 solves + cholesky."""
    k = Hd.shape[0]
    B = Hd[::-1, ::-1]
    if k % 512 == 0 and k > 512:
        L = _chol_lower_blocked(B)
        Linv = _tri_inv_lower_blocked(L)
    else:
        L = jax.lax.linalg.cholesky(B)
        Linv = jax.lax.linalg.triangular_solve(
            L, jnp.eye(k, dtype=Hd.dtype), left_side=True, lower=True
        )
    return Linv[::-1, ::-1]


# ---------------------------------------------------------------------------
# The blocked solver
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_bits", "group_size", "blocksize", "sym", "actorder"))
def gptq_solve(
    w_rows: jax.Array,  # [R, K]  (rows = output channels, cols = contraction)
    H: jax.Array,  # [K, K]
    n_bits: int,
    group_size: Optional[int] = None,
    blocksize: int = 128,
    sym: bool = False,
    actorder: bool = False,
    percdamp: float = 0.01,
):
    """Quantize one weight matrix against its input Hessian.

    Returns (codes uint8 [R, K], scale [R, G], zero [R, G], g_idx [K],
    error scalar). Mirrors `fasterquant` (`/root/reference/gptq.py:128-231`).
    """
    r, k = w_rows.shape
    gs = group_size or k
    if k % gs:
        raise ValueError(f"K={k} not divisible by group_size={gs}")
    blocksize = min(blocksize, k)
    if k % blocksize:
        raise ValueError(f"K={k} not divisible by blocksize={blocksize}")
    if gs % blocksize and blocksize % gs:
        raise ValueError(f"blocksize={blocksize} and group_size={gs} must nest")
    maxq = 2**n_bits - 1
    n_groups = k // gs

    W = w_rows.astype(jnp.float32)
    dead = jnp.diag(H) == 0
    H = H.at[jnp.diag_indices(k)].set(jnp.where(dead, 1.0, jnp.diag(H)))
    W = jnp.where(dead[None, :], 0.0, W)

    if actorder:
        perm = jnp.argsort(-jnp.diag(H))
        W = W[:, perm]
        H = H[perm][:, perm]
    else:
        perm = jnp.arange(k)

    damp = percdamp * jnp.mean(jnp.diag(H))
    Hd = H.at[jnp.diag_indices(k)].add(damp)
    # Hinv = upper-Cholesky factor of H^-1 (reference gptq.py:164-167)
    Hinv = inv_cholesky_upper(Hd)

    col_idx = jnp.arange(k)
    blk_idx = jnp.arange(blocksize)

    def block_body(bi, carry):
        W, Q, scales, zeros, loss = carry
        i1 = bi * blocksize
        W1 = jax.lax.dynamic_slice(W, (0, i1), (r, blocksize))
        Hinv_rows = jax.lax.dynamic_slice(Hinv, (i1, 0), (blocksize, k))  # rows i1..i2 over all cols
        Hinv1 = jax.lax.dynamic_slice(Hinv_rows, (0, i1), (blocksize, blocksize))

        def col_body(i, inner):
            W1, Q1, Err1, loss, scales, zeros = inner
            c = i1 + i
            w = W1[:, i]
            d = Hinv1[i, i]

            def refresh(sz):
                scales, zeros = sz
                # group params from the PRISTINE W (the reference's
                # find_params reads the un-updated full matrix,
                # `gptq.py:188-195` — W's block region only receives the
                # error feedback after the inner loop); the group always
                # starts at c (c % gs == 0 when triggered)
                Wg = jax.lax.dynamic_slice(W, (0, c), (r, gs))
                s, z = gptq_find_params(Wg, n_bits, sym)
                g = c // gs
                scales = jax.lax.dynamic_update_slice(scales, s[:, None], (0, g))
                zeros = jax.lax.dynamic_update_slice(zeros, z[:, None], (0, g))
                return scales, zeros

            scales, zeros = jax.lax.cond(
                c % gs == 0, refresh, lambda sz: sz, (scales, zeros)
            )
            g = c // gs
            s_col = jax.lax.dynamic_slice(scales, (0, g), (r, 1))[:, 0]
            z_col = jax.lax.dynamic_slice(zeros, (0, g), (r, 1))[:, 0]
            q, dq = _quantize_col(w, s_col, z_col, maxq)
            err = (w - dq) / d
            loss = loss + jnp.sum((w - dq) ** 2 / d**2) / 2.0
            # masked rank-1 update within the block: cols j > i
            mask = (blk_idx > i).astype(jnp.float32)[None, :]
            W1 = W1 - (err[:, None] * Hinv1[i, :][None, :]) * mask
            Q1 = Q1.at[:, i].set(q)
            Err1 = Err1.at[:, i].set(err)
            return W1, Q1, Err1, loss, scales, zeros

        Q1 = jnp.zeros((r, blocksize), jnp.float32)
        Err1 = jnp.zeros((r, blocksize), jnp.float32)
        W1, Q1, Err1, loss, scales, zeros = jax.lax.fori_loop(
            0, blocksize, col_body, (W1, Q1, Err1, loss, scales, zeros)
        )
        W = jax.lax.dynamic_update_slice(W, W1, (0, i1))
        Q = jax.lax.dynamic_update_slice(Q, Q1, (0, i1))
        # trailing update: W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:] (masked)
        upd = Err1 @ Hinv_rows  # [R, K]
        tail_mask = (col_idx >= i1 + blocksize).astype(jnp.float32)[None, :]
        W = W - upd * tail_mask
        return W, Q, scales, zeros, loss

    Q0 = jnp.zeros((r, k), jnp.float32)
    scales0 = jnp.ones((r, n_groups), jnp.float32)
    zeros0 = jnp.zeros((r, n_groups), jnp.float32)
    W, Q, scales, zeros, loss = jax.lax.fori_loop(
        0, k // blocksize, block_body, (W, Q0, scales0, zeros0, jnp.float32(0.0))
    )

    g_idx = col_idx // gs
    if actorder:
        invperm = jnp.argsort(perm)
        Q = Q[:, invperm]
        g_idx = g_idx[invperm]
    codes = Q.astype(jnp.uint8)
    return codes, scales, zeros, g_idx, loss


#: one jitted program for solve + pack: eagerly, the Hinv pipeline and the
#: post-solve transpose/pack each materialize full-size copies (4+ x 786 MB
#: at K=14336) — under jit XLA reuses the buffers. No donation: MoE expert
#: calibration reuses one input Hessian for both the gate and up solves.
@partial(
    jax.jit,
    static_argnames=("spec", "blocksize", "sym", "actorder", "percdamp", "pack"),
)
def _solve_and_pack(w_kn, H, *, spec, blocksize, sym, actorder, percdamp, pack):
    codes, scales, zeros, g_idx, err = gptq_solve(
        w_kn.T,
        H,
        n_bits=spec.n_bits,
        group_size=spec.group_size,
        blocksize=blocksize,
        sym=sym,
        actorder=actorder,
        percdamp=percdamp,
    )
    qt = from_codes(
        codes.T,  # [K, N]
        scales.T,  # [G, N]
        zeros.T,
        spec,
        pack=pack,
        out_dtype=w_kn.dtype if jnp.issubdtype(w_kn.dtype, jnp.floating) else jnp.bfloat16,
        # with act-order + grouping the column→group map follows the
        # activation-order permutation (reference `gptq.py:216-219`); the
        # contiguous map is the identity-by-construction otherwise
        g_idx=g_idx if (actorder and spec.group_size) else None,
    )
    return qt, err


def gptq_quantize_weight(
    w_kn: jax.Array,  # [K, N] framework layout
    H: jax.Array,
    spec: QuantSpec,
    blocksize: int = 128,
    actorder: bool = False,
    percdamp: float = 0.01,
    pack: bool = False,
) -> Tuple[QuantizedTensor, jax.Array]:
    """GPTQ-quantize a framework-layout weight; returns (qtensor, error).

    With actorder the codes are returned in original column order (the
    permutation is only internal). Ungrouped actorder needs no extra state
    (per-matrix params are order-independent); actorder WITH grouping
    follows the reference exactly — group membership tracks the *permuted*
    column order, carried as `QuantizedTensor.g_idx` (AutoGPTQ's permuted
    `g_idx` storage, `/root/reference/gptq.py:153-156,188-195,216-219`).
    g_idx tensors dequantize through the gather path and ride the XLA
    dequant matmul (the packed/a8/s4 kernels require contiguous groups) —
    use actorder=False (the study default) when serving throughput matters.
    """
    if spec.n_bits > 8:
        # codes live in int8 containers; 9-15-bit grids would wrap silently
        raise NotImplementedError(
            f"{spec.n_bits}-bit codes exceed int8 storage; use fake-quant "
            "(fake_quant_dynamic) for 9-15 bit studies"
        )
    return _solve_and_pack(
        w_kn,
        H,
        spec=spec,
        blocksize=blocksize,
        sym=spec.symmetric or spec.disable_zero_point,
        actorder=actorder,
        percdamp=percdamp,
        pack=pack,
    )
