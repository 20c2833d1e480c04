"""GPTQ tests: solver vs a direct NumPy transcription of the published
algorithm, and end-to-end improvement over RTN on a tiny model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.quant import QuantSpec, dequantize
from llama3_quantization_tpu.quant.calibration import gptq_quantize_model
from llama3_quantization_tpu.quant.gptq import (
    gptq_find_params,
    gptq_quantize_weight,
    gptq_solve,
    hessian_init,
    hessian_update,
)


# ---------------------------------------------------------------------------
# NumPy oracle: straight port of the published GPTQ column loop (unblocked)
# ---------------------------------------------------------------------------


def np_find_params(w, n_bits, sym=False):
    maxq = 2**n_bits - 1
    xmin = np.minimum(w.min(1), 0)
    xmax = np.maximum(w.max(1), 0)
    if sym:
        xmax = np.maximum(np.abs(xmin), xmax)
        xmin = np.where(xmin < 0, -xmax, xmin)
    deg = (xmin == 0) & (xmax == 0)
    xmin[deg], xmax[deg] = -1, 1
    scale = (xmax - xmin) / maxq
    zero = np.full_like(scale, (maxq + 1) / 2) if sym else np.round(-xmin / scale)
    return scale, zero


def np_gptq(W, H, n_bits, group_size=None, percdamp=0.01):
    """Unblocked column-by-column GPTQ with error feedback."""
    W = W.astype(np.float64).copy()
    H = H.astype(np.float64).copy()
    R, K = W.shape
    gs = group_size or K
    maxq = 2**n_bits - 1
    dead = np.diag(H) == 0
    H[dead, dead] = 1
    W[:, dead] = 0
    damp = percdamp * np.mean(np.diag(H))
    H[np.diag_indices(K)] += damp
    Hinv_full = np.linalg.inv(H)
    # upper-Cholesky factor U with Hinv = U^T U (np returns L with A = L L^T,
    # so U = L^T)
    Hinv = np.linalg.cholesky(Hinv_full).T
    Q = np.zeros_like(W)
    scales = np.zeros((R, K // gs))
    zeros = np.zeros((R, K // gs))
    s = z = None
    loss = 0.0
    for c in range(K):
        if c % gs == 0:
            s, z = np_find_params(W[:, c : c + gs], n_bits)
            scales[:, c // gs] = s
            zeros[:, c // gs] = z
        w = W[:, c]
        d = Hinv[c, c]
        q = np.clip(np.round(w / s) + z, 0, maxq)
        dq = s * (q - z)
        err = (w - dq) / d
        loss += np.sum((w - dq) ** 2 / d**2) / 2
        W[:, c + 1 :] -= np.outer(err, Hinv[c, c + 1 :])
        Q[:, c] = q
    return Q, scales, zeros, loss


@pytest.mark.parametrize("gs", [None, 16, 64])
def test_gptq_solver_matches_numpy_oracle(rng, gs):
    R, K = 24, 64
    X = rng.standard_normal((256, K)).astype(np.float32)
    H = (2 / 256) * X.T @ X
    W = rng.standard_normal((R, K)).astype(np.float32)
    codes, scales, zeros, g_idx, loss = gptq_solve(
        jnp.asarray(W), jnp.asarray(H), n_bits=4, group_size=gs, blocksize=16
    )
    Q_np, s_np, z_np, loss_np = np_gptq(W, H, 4, gs)
    # codes match the oracle (tiny fp reassociation can flip borderline
    # rounds; demand >99% exact agreement and matching loss)
    agree = (np.asarray(codes) == Q_np).mean()
    assert agree > 0.99, f"only {agree:.3f} of codes agree"
    np.testing.assert_allclose(np.asarray(scales), s_np, rtol=1e-4, atol=1e-6)
    assert abs(float(loss) - loss_np) / max(loss_np, 1e-9) < 0.05


def np_gptq_actorder(W, H, n_bits, group_size, percdamp=0.01):
    """Oracle for act-order + grouping (`/root/reference/gptq.py:153-156,
    188-195,216-219`): permute columns by descending diag(H), run the
    standard loop over permuted order (groups follow the permutation),
    un-permute Q and g_idx at the end. Scales stay in permuted-group order."""
    perm = np.argsort(-np.diag(H), kind="stable")
    invperm = np.argsort(perm)
    Q, scales, zeros, loss = np_gptq(W[:, perm], H[perm][:, perm], n_bits, group_size, percdamp)
    K = W.shape[1]
    g_idx = (np.arange(K) // group_size)[invperm]
    return Q[:, invperm], scales, zeros, g_idx, loss


def test_gptq_actorder_grouped_matches_numpy_oracle(rng):
    """actorder=True with grouping: codes come back in original column
    order, scales per PERMUTED group, and g_idx maps each original column
    to its permuted group (the reference's AutoGPTQ-style storage)."""
    R, K, gs = 24, 64, 16
    X = rng.standard_normal((256, K)).astype(np.float32)
    # skew the column energies so the act-order permutation is non-trivial
    X *= np.logspace(0, 1.5, K).astype(np.float32)[rng.permutation(K)]
    H = (2 / 256) * X.T @ X
    W = rng.standard_normal((R, K)).astype(np.float32)
    codes, scales, zeros, g_idx, loss = gptq_solve(
        jnp.asarray(W), jnp.asarray(H), n_bits=4, group_size=gs, blocksize=16,
        actorder=True,
    )
    Q_np, s_np, z_np, g_np, loss_np = np_gptq_actorder(W, H, 4, gs)
    np.testing.assert_array_equal(np.asarray(g_idx), g_np)
    agree = (np.asarray(codes) == Q_np).mean()
    assert agree > 0.99, f"only {agree:.3f} of codes agree"
    np.testing.assert_allclose(np.asarray(scales), s_np, rtol=1e-4, atol=1e-6)
    assert abs(float(loss) - loss_np) / max(loss_np, 1e-9) < 0.05


def test_gptq_actorder_grouped_dequant_and_matmul(rng):
    """gptq_quantize_weight(actorder, grouped) stores g_idx; dequantize
    gathers per-column params, and qmatmul routes to the dequant path with
    identical results (packed and unpacked storage)."""
    from llama3_quantization_tpu.ops.matmul import backend, qmatmul

    R, K, gs = 16, 64, 16
    X = rng.standard_normal((128, K)).astype(np.float32)
    X *= np.logspace(0, 1, K).astype(np.float32)[rng.permutation(K)]
    H = (2 / 128) * X.T @ X
    W = rng.standard_normal((R, K)).astype(np.float32)
    spec = QuantSpec(n_bits=4, group_size=gs)
    for pack in (False, True):
        qt, _ = gptq_quantize_weight(
            jnp.asarray(W.T), jnp.asarray(H), spec, blocksize=16, actorder=True,
            pack=pack,
        )
        assert qt.g_idx is not None
        Wq = np.asarray(dequantize(qt, jnp.float32))  # [K, R]
        # oracle dequant: scale/zero gathered per column by g_idx
        Q_np, s_np, z_np, g_np, _ = np_gptq_actorder(W, H, 4, gs)
        W_ref = (Q_np - z_np[:, g_np]) * s_np[:, g_np]  # [R, K]
        agree = np.isclose(Wq.T, W_ref, rtol=1e-4, atol=1e-5).mean()
        assert agree > 0.99, f"pack={pack}: only {agree:.3f} close"
        x = jnp.asarray(rng.standard_normal((3, K)).astype(np.float32))
        y_ref = np.asarray(x) @ Wq
        for be in ("xla", "a8", "s4", "pallas"):
            with backend(be):
                y = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32))
            np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-3)


def test_gptq_actorder_grouped_beats_actorder_off(rng):
    """On a Hessian with strongly skewed column energies, quantizing the
    high-energy columns first (act-order) lowers the proxy loss
    E|x(W-Wq)|^2 vs natural order — the reason the flag exists."""
    R, K, T, gs = 32, 128, 1024, 32
    base = rng.standard_normal((T, 16)).astype(np.float32)
    mix = rng.standard_normal((16, K)).astype(np.float32)
    X = base @ mix + 0.05 * rng.standard_normal((T, K)).astype(np.float32)
    X *= np.logspace(0, 2, K).astype(np.float32)[rng.permutation(K)]
    H = (2 / T) * X.T @ X
    W = rng.standard_normal((R, K)).astype(np.float32)
    spec = QuantSpec(n_bits=2, group_size=gs)
    errs = {}
    for actorder in (False, True):
        qt, _ = gptq_quantize_weight(
            jnp.asarray(W.T), jnp.asarray(H), spec, blocksize=32, actorder=actorder
        )
        Wq = np.asarray(dequantize(qt, jnp.float32)).T
        errs[actorder] = np.mean((X @ (W - Wq).T) ** 2)
    assert errs[True] < errs[False], errs


def test_gptq_beats_rtn_on_correlated_inputs(rng):
    """The whole point of GPTQ: on correlated activations, proxy loss
    E|x(W-Wq)|^2 is lower than RTN's."""
    R, K, T = 32, 64, 512
    base = rng.standard_normal((T, 8)).astype(np.float32)
    mix = rng.standard_normal((8, K)).astype(np.float32)
    X = base @ mix + 0.1 * rng.standard_normal((T, K)).astype(np.float32)
    H = (2 / T) * X.T @ X
    W = rng.standard_normal((R, K)).astype(np.float32)
    spec = QuantSpec(n_bits=3, group_size=16)

    qt, err = gptq_quantize_weight(jnp.asarray(W.T), jnp.asarray(H), spec, blocksize=16)
    W_gptq = np.asarray(dequantize(qt, jnp.float32)).T

    from llama3_quantization_tpu.quant import quantize_rtn

    qt_rtn = quantize_rtn(jnp.asarray(W.T), QuantSpec(n_bits=3, group_size=16))
    W_rtn = np.asarray(dequantize(qt_rtn, jnp.float32)).T

    e_gptq = np.mean((X @ (W - W_gptq).T) ** 2)
    e_rtn = np.mean((X @ (W - W_rtn).T) ** 2)
    assert e_gptq < e_rtn * 0.9, (e_gptq, e_rtn)


def test_hessian_streaming_matches_batch(rng):
    K = 32
    xs = [rng.standard_normal((2, 8, K)).astype(np.float32) for _ in range(4)]
    st = hessian_init(K)
    for x in xs:
        st = hessian_update(st, jnp.asarray(x))
    allx = np.concatenate([x.reshape(-1, K) for x in xs])
    n = sum(x.shape[0] for x in xs)
    H_ref = (2 / n) * allx.T @ allx
    np.testing.assert_allclose(np.asarray(st.H), H_ref, rtol=1e-4, atol=1e-5)
    assert st.nsamples == n


def test_gptq_model_improves_over_rtn():
    """End-to-end: GPTQ W3 PPL <= RTN W3 PPL on a tiny model with a
    self-generated (predictable) stream."""
    from functools import partial

    from llama3_quantization_tpu.eval.ppl import compute_ppl
    from llama3_quantization_tpu.models import (
        TINY_LLAMA,
        decode_step,
        init_kv_cache,
        init_params,
        quantize_model_rtn,
    )

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    SEQ = 32
    total = SEQ * 2
    toks = jax.random.randint(jax.random.PRNGKey(5), (1, 4), 0, cfg.vocab_size)
    cache = init_kv_cache(cfg, 1, total, dtype=jnp.float32)
    step = jax.jit(partial(decode_step, cfg=cfg))
    logits, cache = decode_step(params, cache, toks, jnp.int32(0), cfg)
    out = [np.asarray(toks)]
    nxt = jnp.argmax(logits[:, -1:, :], axis=-1)
    for pos in range(4, total):
        out.append(np.asarray(nxt))
        logits, cache = step(params, cache, nxt, jnp.int32(pos))
        nxt = jnp.argmax(logits[:, -1:, :], axis=-1)
    stream = np.concatenate(out, axis=1)

    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (8, SEQ))
    spec = QuantSpec(n_bits=3, group_size=32)
    qp_gptq = gptq_quantize_model(params, cfg, calib, spec, blocksize=32)
    qp_rtn = quantize_model_rtn(params, cfg, spec)
    ppl_gptq = compute_ppl(qp_gptq, cfg, stream, seqlen=SEQ)
    ppl_rtn = compute_ppl(qp_rtn, cfg, stream, seqlen=SEQ)
    assert np.isfinite(ppl_gptq)
    assert ppl_gptq < ppl_rtn * 1.02, (ppl_gptq, ppl_rtn)


def test_find_params_degenerate_rows():
    w = jnp.zeros((4, 8))
    s, z = gptq_find_params(w, 4)
    assert np.all(np.asarray(s) > 0)


def test_gptq_true_sequential_runs_and_is_sane():
    from llama3_quantization_tpu.eval.ppl import compute_ppl
    from llama3_quantization_tpu.models import TINY_LLAMA, init_params

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 16))
    spec = QuantSpec(n_bits=4, group_size=32)
    qp = gptq_quantize_model(params, cfg, calib, spec, blocksize=32, true_sequential=True)
    stream = np.random.default_rng(2).integers(0, cfg.vocab_size, (1, 64))
    ppl = compute_ppl(qp, cfg, stream, seqlen=32)
    assert np.isfinite(ppl) and ppl < cfg.vocab_size * 2


def test_mixed_precision_gptq():
    """Worst layers upgraded to W8 must strictly improve over pure W2."""
    from llama3_quantization_tpu.eval.ppl import compute_ppl
    from llama3_quantization_tpu.models import TINY_LLAMA, init_params
    from llama3_quantization_tpu.quant.mixed import mixed_precision_gptq

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 16))
    base = QuantSpec(n_bits=2, group_size=32)
    up = QuantSpec(n_bits=8, group_size=32)
    qp_mixed, upgraded = mixed_precision_gptq(
        params, cfg, calib, base, up, topk=4, blocksize=32
    )
    assert len(upgraded) == 4
    qp_base = gptq_quantize_model(params, cfg, calib, base, blocksize=32)
    from llama3_quantization_tpu.models import forward_logits

    toks = jnp.asarray(calib)
    fp = forward_logits(params, toks, cfg)
    err_mixed = float(jnp.mean((forward_logits(qp_mixed, toks, cfg) - fp) ** 2))
    err_base = float(jnp.mean((forward_logits(qp_base, toks, cfg) - fp) ** 2))
    assert err_mixed < err_base, (err_mixed, err_base)


def test_mixed_precision_gptq_moe():
    """MoE: expert pseudo-names must not enter the Observer (they are not
    addressable in params['layers']); only real attention linears upgrade."""
    from llama3_quantization_tpu.models import init_params
    from llama3_quantization_tpu.models.configs import TINY_MIXTRAL
    from llama3_quantization_tpu.models.params import linear_names
    from llama3_quantization_tpu.quant.mixed import mixed_precision_gptq

    cfg = TINY_MIXTRAL
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 16))
    base = QuantSpec(n_bits=2, group_size=32)
    up = QuantSpec(n_bits=8, group_size=32)
    qp, upgraded = mixed_precision_gptq(params, cfg, calib, base, up, topk=2, blocksize=32)
    assert len(upgraded) == 2
    names = set(linear_names(cfg))
    for key in upgraded:
        name = key.rsplit(".", 1)[0]
        assert name in names, key


def test_snr_diagnostics():
    """snr_log rows behave like the reference print_loss probe: W8 SNR
    error < W2, int8-input SNR >= fp-input SNR, and the table renders."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama3_quantization_tpu.models import init_params
    from llama3_quantization_tpu.models.configs import TINY_LLAMA
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.calibration import gptq_quantize_model
    from llama3_quantization_tpu.quant.gptq import format_snr_table, snr_error

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16))

    def run(bits):
        rows = []
        gptq_quantize_model(
            params, cfg, toks, QuantSpec(n_bits=bits, group_size=32),
            batch_size=4, snr_log=rows,
        )
        return rows

    rows8, rows2 = run(8), run(2)
    assert len(rows8) == len(rows2) > 0
    mean8 = sum(r["fp_inp_snr"] for r in rows8) / len(rows8)
    mean2 = sum(r["fp_inp_snr"] for r in rows2) / len(rows2)
    assert mean8 < mean2
    for r in rows8:
        assert r["q_inp_snr"] >= r["fp_inp_snr"] - 1e-6
    table = format_snr_table(rows8)
    assert "fp_inp_SNR" in table and "layer0.q" in table

    # snr_error basics
    y = jnp.ones((4, 8))
    assert snr_error(y, y) == 0.0
    assert snr_error(y * 1.1, y) > 0.0


def test_gptq_group_smaller_than_block(rng):
    """gs < blocksize: mid-block group refreshes read the pristine W (the
    reference's blocked fasterquant semantics); solver runs and beats RTN."""
    import jax.numpy as jnp

    from llama3_quantization_tpu.quant.gptq import gptq_quantize_weight
    from llama3_quantization_tpu.quant.qtensor import dequantize, quantize_rtn
    from llama3_quantization_tpu.quant.quantizer import QuantSpec

    R, K = 16, 64
    X = rng.standard_normal((256, K)).astype(np.float32)
    # correlated inputs make error feedback matter
    X = X @ (np.eye(K) + 0.4 * rng.standard_normal((K, K)).astype(np.float32) / np.sqrt(K))
    H = (2 / 256) * X.T @ X
    W = rng.standard_normal((R, K)).astype(np.float32)
    spec = QuantSpec(n_bits=3, group_size=16)
    qt, err = gptq_quantize_weight(jnp.asarray(W.T), jnp.asarray(H), spec, blocksize=32)
    out_g = np.asarray(X @ np.asarray(dequantize(qt)))
    out_r = np.asarray(X @ np.asarray(dequantize(quantize_rtn(jnp.asarray(W.T), spec))))
    ref = X @ W.T
    assert np.isfinite(err)
    assert np.mean((out_g - ref) ** 2) <= np.mean((out_r - ref) ** 2) * 1.05


def test_gptq_rejects_wide_bits(rng):
    import jax.numpy as jnp
    import pytest

    from llama3_quantization_tpu.quant.gptq import gptq_quantize_weight
    from llama3_quantization_tpu.quant.quantizer import QuantSpec

    W = rng.standard_normal((8, 16)).astype(np.float32)
    H = np.eye(16, dtype=np.float32)
    with pytest.raises(NotImplementedError):
        gptq_quantize_weight(jnp.asarray(W.T), jnp.asarray(H), QuantSpec(n_bits=12))


def test_blocked_cholesky_factor_matches_scipy(rng):
    """The fori_loop blocked Cholesky + triangular inverse (the K=14336
    HBM fix: XLA's Cholesky/TriangularSolve expanders unroll constant-index
    iterations whose temps stop aliasing — 44.5 GB at down_proj size) must
    reproduce scipy's chol(H^-1, upper) factor exactly."""
    import jax.numpy as jnp
    import scipy.linalg as sla

    from llama3_quantization_tpu.quant.gptq import (
        _chol_lower_blocked, _tri_inv_lower_blocked, inv_cholesky_upper)

    k = 1024  # divisible by 512 -> exercises both blocked paths
    X = rng.standard_normal((2 * k, k)).astype(np.float32)
    H = (X.T @ X / k + np.eye(k)).astype(np.float32)

    L = np.asarray(_chol_lower_blocked(jnp.asarray(H)))
    Ls = sla.cholesky(H, lower=True)
    np.testing.assert_allclose(L, Ls, atol=5e-3 * np.abs(Ls).max())

    Li = np.asarray(_tri_inv_lower_blocked(jnp.asarray(Ls.astype(np.float32))))
    np.testing.assert_allclose(Li @ Ls, np.eye(k), atol=1e-3)

    U = np.asarray(inv_cholesky_upper(jnp.asarray(H)))
    Hinv = sla.cho_solve((Ls, True), np.eye(k, dtype=np.float32))
    Us = sla.cholesky(Hinv, lower=False)
    np.testing.assert_allclose(U, Us, atol=1e-2 * np.abs(Us).max())
    assert np.allclose(np.triu(U), U)


def test_capture_aliases_match_capture_buffers(rng):
    """capture_aliases must name exactly the keys layer_linear_inputs fills
    with the same buffer (q/k/v; llama gate/up; falcon-parallel fc1) — the
    calibration loop accumulates one Hessian per canonical key on the
    strength of this table."""
    import jax
    import jax.numpy as jnp

    from llama3_quantization_tpu.models import init_params
    from llama3_quantization_tpu.models.configs import (
        TINY_FALCON, TINY_LLAMA, TINY_MIXTRAL, TINY_OPT)
    from llama3_quantization_tpu.models.transformer import NO_QUANT
    from llama3_quantization_tpu.quant.calibration import (
        _layer_slice, capture_aliases, embed_calibration, layer_linear_inputs)

    for cfg in (TINY_LLAMA, TINY_OPT, TINY_FALCON, TINY_MIXTRAL):
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
        h, cos_sin, mask = embed_calibration(params, cfg, toks)
        p_l = _layer_slice(params["layers"], 0)
        caps = layer_linear_inputs(p_l, h, cfg, NO_QUANT, cos_sin, mask)
        aliases = capture_aliases(cfg)
        for alias, canonical in aliases.items():
            if alias not in caps:
                continue  # e.g. no fc1 on llama
            assert caps[alias] is caps[canonical], (cfg.arch, alias)
        # and nothing else aliases: every non-alias pair is a distinct buffer
        keys = [k for k in caps if k not in aliases]
        for i, a in enumerate(keys):
            for b in keys[i + 1:]:
                assert caps[a] is not caps[b], (cfg.arch, a, b)
