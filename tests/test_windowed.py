"""Window write-combined decode (models/windowed.py).

- `_ring_gather_merge` is exact vs a numpy reference (int8, scales, and
  T-pair-packed int4 nibbles; scalar / per-row / wrapping positions).
- `decode_window` tracks the per-step kernel decode path on a tiny model
  (tolerance-bound: the window segment runs exact fp attention where the
  kernel quantizes q/probs to s8 — a strictly finer treatment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama3_quantization_tpu.models import (
    TINY_LLAMA,
    init_kv_cache,
    init_params,
    set_decode_kernel,
)
from llama3_quantization_tpu.models.transformer import decode_step, decode_step_multi
from llama3_quantization_tpu.models.windowed import (
    _ring_gather_merge,
    decode_window,
    windowed_ok,
)
from llama3_quantization_tpu.ops.kvcache import kv4_pack, kv4_unpack_codes


# big-compile module: the conftest `big_compile` hook clears XLA caches
# before this module's first test (the CPU compiler aborts when the
# interpret-mode scan compiles with the whole suite's executables cached)
pytestmark = pytest.mark.big_compile


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("pos0", [[0, 3], [5, 13]])  # 13 + 6 wraps T=16
def test_ring_gather_merge_exact(packed, pos0):
    L, B, H, T, D, KW = 2, 2, 3, 16, 4, 6
    rng = np.random.default_rng(0)
    old_codes = rng.integers(-7, 8, (L, B, H, T, D)).astype(np.int8)
    win = rng.integers(-7, 8, (L, B, H, KW, D)).astype(np.int8)
    exp = old_codes.copy()
    for b in range(B):
        for j in range(KW):
            exp[:, b, :, (pos0[b] + j) % T, :] = win[:, b, :, j, :]
    p0 = jnp.asarray(pos0)
    if packed:
        buf = kv4_pack(jnp.asarray(old_codes))
        got = _ring_gather_merge(buf, jnp.asarray(win), p0, T, True)
        got = np.asarray(kv4_unpack_codes(got))
    else:
        got = np.asarray(
            _ring_gather_merge(jnp.asarray(old_codes), jnp.asarray(win), p0, T, False)
        )
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("kv_bits", [8, 4])
def test_decode_window_matches_per_step_kernel(kv_bits):
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    n_new = 4
    set_decode_kernel("interpret")
    try:
        # per-step reference (kernel path)
        cache_a = init_kv_cache(cfg, 2, 16, quantized=kv_bits)
        lg, cache_a = decode_step(params, cache_a, toks, jnp.int32(0), cfg)
        tok = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)
        outs_a, tok_a = [], tok
        for i in range(n_new):
            lg, cache_a = decode_step(params, cache_a, tok_a, jnp.int32(8 + i), cfg)
            outs_a.append(lg[:, -1])
            tok_a = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)

        # windowed path from the same prefill state
        cache_b = init_kv_cache(cfg, 2, 16, quantized=kv_bits)
        lg2, cache_b = decode_step(params, cache_b, toks, jnp.int32(0), cfg)
        assert windowed_ok(cfg, cache_b, __import__(
            "llama3_quantization_tpu.models.transformer", fromlist=["NO_QUANT"]
        ).NO_QUANT, 0)
        toks_b, cache_b = decode_window(
            params, cache_b, tok, jnp.int32(8), n_new, cfg
        )
    finally:
        set_decode_kernel("auto")

    toks_a_seq = [int(jnp.argmax(o[r])) for o in outs_a for r in range(2)]
    toks_b_seq = [int(toks_b[r, i]) for i in range(n_new) for r in range(2)]
    # greedy streams agree on a tiny model unless a logit race is within
    # quantization noise; require >= 3/4 agreement and close caches
    agree = sum(a == b for a, b in zip(toks_a_seq, toks_b_seq))
    assert agree >= len(toks_a_seq) - 2, (toks_a_seq, toks_b_seq)

    # the merged cache matches the per-step cache where the streams agreed
    # (codes written from near-identical hidden states)
    if agree == len(toks_a_seq):
        for k in ("k_s", "v_s"):
            np.testing.assert_allclose(
                np.asarray(cache_a[k]), np.asarray(cache_b[k]), rtol=0.1, atol=1e-3
            )


def test_decode_window_multi_slot_positions():
    """Vector pos0 (continuous-batching shape): rows at different positions
    decode + merge correctly (smoke: runs, cache scales updated at the
    right slots)."""
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    set_decode_kernel("interpret")
    try:
        cache = init_kv_cache(cfg, 2, 16, quantized=8)
        toks = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, cfg.vocab_size)
        _, cache = decode_step(params, cache, toks, jnp.int32(0), cfg)
        pos0 = jnp.asarray([6, 3], jnp.int32)
        tok0 = jnp.asarray([[1], [2]], jnp.int32)
        before = np.asarray(cache["k_s"]).copy()
        toks_out, cache = decode_window(params, cache, tok0, pos0, 3, cfg)
        after = np.asarray(cache["k_s"])
        assert toks_out.shape == (2, 3)
        for b, p in enumerate([6, 3]):
            changed = np.any(before[:, b] != after[:, b], axis=(0, 2))[:, 0]
            assert changed[p : p + 3].all()
            assert not changed[p + 3 :].any()
    finally:
        set_decode_kernel("auto")


def test_windowed_serve_under_tp_mesh():
    """Round 4 lifts windowed_ok's v1 single-replica gate: with the int8
    cache on the codes-direct XLA attention (plain GSPMD — no shard_map),
    the windowed serving fast path runs under a dp x tp decode mesh and
    emits exactly the single-replica tokens."""
    from llama3_quantization_tpu.models import init_params
    from llama3_quantization_tpu.models.transformer import (
        set_decode_attn,
        set_decode_mesh,
    )
    from llama3_quantization_tpu.parallel import shard_params
    from llama3_quantization_tpu.serving import ServingEngine

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    lens = [6, 8]

    def run(shard):
        set_decode_kernel("interpret")
        set_decode_attn("xla")
        try:
            p = params
            if shard:
                # submesh: slots=2 bounds dp, kv_heads=2 bounds tp
                from jax.sharding import Mesh

                mesh = Mesh(
                    np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp")
                )
                set_decode_mesh(mesh)
                p = shard_params(params, mesh, cfg)
            eng = ServingEngine(p, cfg, max_slots=2, max_len=64,
                                quantized_cache=True)
            assert windowed_ok(cfg, eng.cache, eng._rq, eng._sink_tokens), (
                "windowed fast path must engage (mesh gate lifted)"
            )
            for pr, n in zip(prompts, lens):
                eng.submit(pr, n, None)
            eng.run_pipelined(4)
            assert eng._decode_win, "windowed program was not used"
            return sorted(tuple(r.generated) for r in eng.requests.values())
        finally:
            set_decode_kernel("auto")
            set_decode_attn("auto")
            set_decode_mesh(None)

    ref = run(shard=False)
    out = run(shard=True)
    assert ref == out


@pytest.mark.parametrize("packed", [False, True])
def test_ring_gather_merge_sink_aware(packed):
    """Sink+ring merge (round 4): slots [0, sink) pin absolute positions;
    ring slots hold the largest p <= last with p == slot (mod w). Checked
    against a step-by-step numpy simulation of `_ring_write_and_mask`'s
    write rule across a wrap."""
    L, B, H, T, D, KW, SINK = 1, 2, 2, 16, 4, 5, 4
    w = T - SINK
    rng = np.random.default_rng(3)
    old_codes = rng.integers(-7, 8, (L, B, H, T, D)).astype(np.int8)
    win = rng.integers(-7, 8, (L, B, H, KW, D)).astype(np.int8)
    pos0 = [14, 3]  # row 0 wraps the ring (positions 14..18), row 1 does not
    exp = old_codes.copy()
    for b in range(B):
        for j in range(KW):
            p = pos0[b] + j
            slot = p if p < T else SINK + (p - SINK) % w
            exp[:, b, :, slot, :] = win[:, b, :, j, :]
    p0 = jnp.asarray(pos0)
    if packed:
        buf = kv4_pack(jnp.asarray(old_codes))
        got = _ring_gather_merge(buf, jnp.asarray(win), p0, T, True, SINK)
        got = np.asarray(kv4_unpack_codes(got))
    else:
        got = np.asarray(
            _ring_gather_merge(
                jnp.asarray(old_codes), jnp.asarray(win), p0, T, False, SINK
            )
        )
    assert np.array_equal(got, exp)


def test_decode_window_sink_tokens_matches_per_step():
    """windowed_ok's last v1 gate (sink_tokens == 0) lifted: pre-wrap, the
    sink+ring windowed decode agrees with the per-step path."""
    from llama3_quantization_tpu.models.transformer import NO_QUANT

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    n_new, sink = 4, 2
    set_decode_kernel("interpret")
    try:
        cache_a = init_kv_cache(cfg, 2, 16, quantized=8)
        lg, cache_a = decode_step(
            params, cache_a, toks, jnp.int32(0), cfg, sink_tokens=sink
        )
        tok = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)
        seq_a, tok_a = [], tok
        for i in range(n_new):
            lg, cache_a = decode_step(
                params, cache_a, tok_a, jnp.int32(8 + i), cfg, sink_tokens=sink
            )
            seq_a.append(int(jnp.argmax(lg[0, -1])))
            tok_a = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)

        cache_b = init_kv_cache(cfg, 2, 16, quantized=8)
        _, cache_b = decode_step(
            params, cache_b, toks, jnp.int32(0), cfg, sink_tokens=sink
        )
        assert windowed_ok(cfg, cache_b, NO_QUANT, sink)
        toks_b, cache_b = decode_window(
            params, cache_b, tok, jnp.int32(8), n_new, cfg, sink_tokens=sink
        )
    finally:
        set_decode_kernel("auto")
    seq_b = [int(toks_b[0, i]) for i in range(n_new)]
    agree = sum(a == b for a, b in zip(seq_a, seq_b))
    assert agree >= n_new - 1, (seq_a, seq_b)
    # merged cache scales match the per-step cache (same codes written)
    if agree == n_new:
        np.testing.assert_allclose(
            np.asarray(cache_a["k_s"]), np.asarray(cache_b["k_s"]),
            rtol=0.1, atol=1e-3,
        )


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("sink", [0, 4])
def test_ring_piece_merge_matches_gather(packed, sink):
    """Round 5: the bounded-scratch piece merge (2-3 static-width DUS
    slices per row instead of a whole-cache gather) is bit-identical to
    `_ring_gather_merge` across non-wrapping, wrapping, and pinned-sink
    positions, scalar and per-row."""
    from llama3_quantization_tpu.models.windowed import _ring_piece_merge

    L, B, H, T, D, KW = 2, 3, 2, 16, 4, 6
    w = T - sink
    rng = np.random.default_rng(7)
    cases = [
        [sink, sink + 1, sink + 2],        # fresh ring, near the start
        [12, 14, 15],                      # wrapping rows (12+6, 14+6 > 16)
        [sink + w - KW, 20, 33],           # edge + deep-wrap positions
    ]
    if sink > 0:
        cases.append([0, 2, 3])            # windows starting in the sink
    for pos0 in cases:
        old = rng.integers(-7, 8, (L, B, H, T, D)).astype(np.int8)
        win = rng.integers(-7, 8, (L, B, H, KW, D)).astype(np.int8)
        scales = rng.normal(size=(L, B, H, T, 1)).astype(np.float32)
        wscales = rng.normal(size=(L, B, H, KW, 1)).astype(np.float32)
        p0 = jnp.asarray(pos0)
        if packed:
            buf = kv4_pack(jnp.asarray(old))
            a = np.asarray(kv4_unpack_codes(
                _ring_gather_merge(buf, jnp.asarray(win), p0, T, True, sink)))
            b = np.asarray(kv4_unpack_codes(
                _ring_piece_merge(buf, jnp.asarray(win), p0, T, True, sink)))
        else:
            a = np.asarray(_ring_gather_merge(
                jnp.asarray(old), jnp.asarray(win), p0, T, False, sink))
            b = np.asarray(_ring_piece_merge(
                jnp.asarray(old), jnp.asarray(win), p0, T, False, sink))
        assert np.array_equal(a, b), (packed, sink, pos0)
        # float scale buffers ride the same code path (packed=False)
        sa = np.asarray(_ring_gather_merge(
            jnp.asarray(scales), jnp.asarray(wscales), p0, T, False, sink))
        sb = np.asarray(_ring_piece_merge(
            jnp.asarray(scales), jnp.asarray(wscales), p0, T, False, sink))
        assert np.array_equal(sa, sb), (packed, sink, pos0)


def test_ring_piece_merge_scalar_pos():
    """Scalar pos0 broadcast (the b=1 greedy decode path)."""
    from llama3_quantization_tpu.models.windowed import _ring_piece_merge

    L, B, H, T, D, KW = 1, 1, 2, 16, 4, 5
    rng = np.random.default_rng(11)
    old = rng.integers(-7, 8, (L, B, H, T, D)).astype(np.int8)
    win = rng.integers(-7, 8, (L, B, H, KW, D)).astype(np.int8)
    for pos0 in (0, 7, 13, 29):
        a = np.asarray(_ring_gather_merge(
            jnp.asarray(old), jnp.asarray(win), jnp.int32(pos0), T, False))
        b = np.asarray(_ring_piece_merge(
            jnp.asarray(old), jnp.asarray(win), jnp.int32(pos0), T, False))
        assert np.array_equal(a, b), pos0


def test_greedy_generate_gates_ring_crossing():
    """Round 5 (VERDICT r4 item 9): the windowed path's eviction
    approximation (frozen main-cache mask -> up to n_steps evicted-but-
    visible tokens once pos0 + n_steps > max_len) measured 1/8 post-wrap
    token agreement vs per-step decode on this ring — so greedy_generate
    now gates it with an in-jit lax.cond and must match the per-step
    chain EXACTLY both before and after the ring boundary."""
    from llama3_quantization_tpu.models.transformer import greedy_generate

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    T, KW = 16, 4
    set_decode_kernel("interpret")
    try:
        cache_a = init_kv_cache(cfg, 1, T, quantized=4)
        from llama3_quantization_tpu.models.transformer import NO_QUANT

        # the windowed branch must be REACHABLE (otherwise this test
        # degenerates to per-step == per-step)
        assert windowed_ok(cfg, cache_a, NO_QUANT, 0)
        lg, cache_a = decode_step(params, cache_a, toks, jnp.int32(0), cfg)
        tok = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)
        cache_b = jax.tree_util.tree_map(lambda x: x, cache_a)
        seq_a, tok_a = [], tok
        for i in range(16):
            lg, cache_a = decode_step(
                params, cache_a, tok_a, jnp.int32(8 + i), cfg
            )
            seq_a.append(int(jnp.argmax(lg[0, -1])))
            tok_a = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)
        # windowed auto-route in KW-step dispatches: windows at pos 8 and
        # 12 stay inside the ring (exact windowed math); pos 16 and 20
        # cross it — the cond must route those through per-step decode
        seq_b, tok_b = [], tok
        for wi in range(4):
            wtoks, cache_b = greedy_generate(
                params, cache_b, tok_b, jnp.int32(8 + KW * wi), KW, cfg
            )
            seq_b.extend(int(t) for t in np.asarray(wtoks)[0])
            tok_b = wtoks[:, -1:].astype(jnp.int32)
    finally:
        set_decode_kernel("auto")
    assert seq_a == seq_b, (seq_a, seq_b)
