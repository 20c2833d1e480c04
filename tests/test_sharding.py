"""Distribution tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.models import (
    TINY_LLAMA,
    forward_logits,
    init_params,
    quantize_model_rtn,
)
from llama3_quantization_tpu.parallel import make_mesh, make_sharded_forward, shard_params
from llama3_quantization_tpu.parallel.train import init_model_lwc, make_lwc_train_step
from llama3_quantization_tpu.quant import QuantSpec



# big-compile module: every test here compiles a fresh shard_map/GSPMD
# program; the conftest big_compile hook clears XLA caches before each so
# the CPU compiler's memory budget is never hit mid-suite (SIGSEGVs
# reproduced at test_flash_decode_kernel_sharded AND
# test_pipeline_parallel_all_archs in different full-suite runs — the
# crash point moves with cache state, so the whole module opts in)
pytestmark = pytest.mark.big_compile

@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh"
    return make_mesh(dp=2, tp=4)


def test_sharded_forward_matches_single_device(mesh):
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    ref = forward_logits(params, toks, cfg)
    sharded = shard_params(params, mesh, cfg)
    fwd = make_sharded_forward(cfg, mesh)
    out = fwd(sharded, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sharded_quantized_forward(mesh):
    """Packed QuantizedTensor weights shard over tp and still reproduce the
    single-device result."""
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=4, group_size=16), pack=True)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    ref = forward_logits(qp, toks, cfg)
    sharded = shard_params(qp, mesh, cfg)
    fwd = make_sharded_forward(cfg, mesh)
    out = fwd(sharded, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_weight_shards_actually_distributed(mesh):
    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0))
    sharded = shard_params(params, mesh, cfg)
    w = sharded["layers"]["gate"]["w"]  # [L, K, N] column-parallel
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert all(sh[2] == w.shape[2] // 4 for sh in shard_shapes), shard_shapes


def test_lwc_train_step_runs_sharded(mesh):
    cfg = TINY_LLAMA
    params = shard_params(init_params(cfg, jax.random.PRNGKey(0)), mesh, cfg)
    wspec = QuantSpec(n_bits=4, group_size=32, lwc=True)
    lwc = init_model_lwc(params, cfg, wspec)
    opt, step = make_lwc_train_step(cfg, mesh, wspec)
    opt_state = opt.init(lwc)
    toks = jax.random.randint(jax.random.PRNGKey(2), (4, 17), 0, cfg.vocab_size)
    lwc1, opt_state, loss1 = step(lwc, opt_state, params, toks)
    lwc2, opt_state, loss2 = step(lwc1, opt_state, params, toks)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    # logits-level check that training moved the clipping parameters
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))),
        jax.tree_util.tree_map(lambda a, b: a - b, lwc, lwc2),
        0.0,
    )
    assert moved > 0


def test_graft_entry_dryrun():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_scaling_benchmark_machinery(mesh):
    """Scaling harness runs at 1/2/4/8 virtual devices and reports
    efficiency relative to the single-device rate."""
    from llama3_quantization_tpu.benchmarks import measure_scaling

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0))
    res = measure_scaling(params, cfg, device_counts=(1, 2, 4), seq=32,
                          batch_per_device=1, iters=2, tp_per_group=2)
    assert 1 in res and 4 in res
    assert res[1]["efficiency"] == 1.0
    for n, r in res.items():
        assert r["tok_s"] > 0


def test_make_pod_mesh_single_host():
    from llama3_quantization_tpu.parallel.distributed import make_pod_mesh

    mesh = make_pod_mesh(tp=4)
    assert dict(mesh.shape) == {"dp": 2, "tp": 4}


def test_pipeline_parallel_matches_reference():
    """GPipe shard_map pipeline == single-device forward, fp and quantized."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from llama3_quantization_tpu.models import (
        forward_logits,
        init_params,
        quantize_model_rtn,
    )
    from llama3_quantization_tpu.models.configs import TINY_LLAMA
    from llama3_quantization_tpu.parallel import (
        make_pipeline_forward,
        shard_params_pipeline,
    )
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = dataclasses.replace(TINY_LLAMA, num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, cfg.vocab_size)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("pp",))

    ref = forward_logits(params, toks, cfg)
    out = make_pipeline_forward(cfg, mesh, n_microbatches=4)(
        shard_params_pipeline(params, mesh, cfg), toks
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # quantized weights ride the same pipeline (QuantizedTensor leaves
    # shard on their stacked layer axis)
    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=8, group_size=32))
    qref = forward_logits(qp, toks, cfg)
    qout = make_pipeline_forward(cfg, mesh, n_microbatches=2)(
        shard_params_pipeline(qp, mesh, cfg), toks
    )
    np.testing.assert_allclose(np.asarray(qout), np.asarray(qref), atol=1e-4)


def test_ring_attention_sp_forward():
    """Sequence-sharded ring-attention forward == full-attention forward
    (fp exact, quantized exact, long-ish sequence)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from llama3_quantization_tpu.models import (
        forward_logits,
        init_params,
        quantize_model_rtn,
    )
    from llama3_quantization_tpu.models.configs import TINY_LLAMA
    from llama3_quantization_tpu.parallel import make_sp_forward
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, cfg.vocab_size)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))

    ref = forward_logits(params, toks, cfg)
    out = make_sp_forward(cfg, mesh)(params, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=8, group_size=32))
    qref = forward_logits(qp, toks, cfg)
    qout = make_sp_forward(cfg, mesh)(qp, toks)
    np.testing.assert_allclose(np.asarray(qout), np.asarray(qref), atol=1e-4)


def test_ring_attention_matches_eager_directly():
    """ring_attention vs the eager masked attention on random q/k/v (GQA)."""
    import math

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from llama3_quantization_tpu.parallel import ring_attention

    b, s, h, g, d = 2, 64, 4, 2, 8
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, g, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, g, d), jnp.float32)

    # eager reference
    rep = h // g
    qg = q.reshape(b, s, g, rep, d)
    scores = jnp.einsum("bsgrd,btgd->bgrst", qg, k) / math.sqrt(d)
    mask = jnp.where(jnp.arange(s)[None, :] <= jnp.arange(s)[:, None], 0.0, -jnp.inf)
    probs = jax.nn.softmax(scores + mask, axis=-1)
    ref = jnp.einsum("bgrst,btgd->bsgrd", probs, v).reshape(b, s, h, d)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    ring = shard_map(
        ring_attention, mesh=mesh,
        in_specs=(P(None, "sp", None, None),) * 3,
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )
    out = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_attention_honors_attn_quant_hooks():
    """rq.k/v hooks change sp outputs the same way they change the eager
    path; grouped/LWC p-specs are rejected."""
    import numpy as np
    import pytest
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from llama3_quantization_tpu.models import forward_logits, init_params
    from llama3_quantization_tpu.models.configs import TINY_LLAMA
    from llama3_quantization_tpu.models.transformer import RuntimeQuantConfig
    from llama3_quantization_tpu.parallel import make_sp_forward
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, cfg.vocab_size)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))

    rq = RuntimeQuantConfig(k=QuantSpec(n_bits=4), v=QuantSpec(n_bits=4))
    ref = forward_logits(params, toks, cfg, rq)
    out = make_sp_forward(cfg, mesh, rq=rq)(params, toks)
    # k/v fake-quant applied in both paths -> same numbers
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # and the quantized run differs from the unquantized one
    base = forward_logits(params, toks, cfg)
    assert float(jnp.max(jnp.abs(ref - base))) > 1e-3

    # LWC p-specs are rejected up front; grouped p-specs are accepted at
    # construction but require the ring block width (s/sp) to divide into
    # whole groups, checked per call.
    with pytest.raises(NotImplementedError):
        make_sp_forward(
            cfg, mesh,
            rq=RuntimeQuantConfig(p=QuantSpec(n_bits=8, lwc=True)),
        )
    bad_group = make_sp_forward(
        cfg, mesh, rq=RuntimeQuantConfig(p=QuantSpec(n_bits=8, group_size=3))
    )
    with pytest.raises(NotImplementedError):
        bad_group(params, toks)  # 64/8 = 8-wide blocks, group_size 3


def test_ring_attention_probs_quant_matches_eager():
    """rq.p (softmax-probs fake-quant) under ring attention == the eager
    path: the two-pass ring derives the per-token prob statistics
    (max = 1/l, min = exp(mn-m)/l) without materializing the row, for both
    the dynamic-minmax and the fix0to1 metrics."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from llama3_quantization_tpu.models import forward_logits, init_params
    from llama3_quantization_tpu.models.configs import TINY_LLAMA
    from llama3_quantization_tpu.models.transformer import RuntimeQuantConfig
    from llama3_quantization_tpu.parallel import make_sp_forward
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, cfg.vocab_size)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    base = forward_logits(params, toks, cfg)

    for spec in (QuantSpec(n_bits=8), QuantSpec(n_bits=8, metric="fix0to1")):
        rq = RuntimeQuantConfig(p=spec)
        ref = forward_logits(params, toks, cfg, rq)
        out = make_sp_forward(cfg, mesh, rq=rq)(params, toks)
        # rounding-edge prob flips aside (ring's online l vs eager's one-shot
        # sum differ in ulps), the quantized rows are identical
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
        # and the hook genuinely bites (differs from the unquantized run)
        assert float(jnp.max(jnp.abs(ref - base))) > 1e-3


def test_collective_matmuls():
    """Ring ag/rs matmuls == dense x @ W, fp and quantized shards."""
    import dataclasses
    from functools import partial

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from llama3_quantization_tpu.ops.matmul import qmatmul
    from llama3_quantization_tpu.parallel import ag_matmul, rs_matmul
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.qtensor import quantize_rtn

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("tp",))
    S, K, N = 32, 64, 48
    x = jax.random.normal(jax.random.PRNGKey(0), (S, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)
    dense = np.asarray(x @ w)

    ag = jax.jit(shard_map(partial(ag_matmul, axis_name="tp"), mesh=mesh,
        in_specs=(P("tp", None), P(None, "tp")), out_specs=P(None, "tp"),
        check_vma=False))
    np.testing.assert_allclose(np.asarray(ag(x, w)), dense, rtol=2e-5, atol=1e-4)

    rs = jax.jit(shard_map(partial(rs_matmul, axis_name="tp"), mesh=mesh,
        in_specs=(P(None, "tp"), P("tp", None)), out_specs=P("tp", None),
        check_vma=False))
    np.testing.assert_allclose(np.asarray(rs(x, w)), dense, rtol=2e-5, atol=1e-4)

    # quantized column shard through ag; group-aligned row shard through rs
    wq = quantize_rtn(w, QuantSpec(n_bits=8, group_size=8))
    refq = np.asarray(qmatmul(x, wq))
    col_spec = dataclasses.replace(
        wq, data=P(None, "tp"), scale=P(None, "tp"),
        zero=None if wq.zero is None else P(None, "tp"))
    agq = jax.jit(shard_map(partial(ag_matmul, axis_name="tp"), mesh=mesh,
        in_specs=(P("tp", None), col_spec), out_specs=P(None, "tp"),
        check_vma=False))
    np.testing.assert_allclose(np.asarray(agq(x, wq)), refq, rtol=2e-5, atol=1e-4)

    row_spec = dataclasses.replace(
        wq, data=P("tp", None), scale=P("tp", None),
        zero=None if wq.zero is None else P("tp", None))
    rsq = jax.jit(shard_map(partial(rs_matmul, axis_name="tp"), mesh=mesh,
        in_specs=(P(None, "tp"), row_spec), out_specs=P("tp", None),
        check_vma=False))
    np.testing.assert_allclose(np.asarray(rsq(x, wq)), refq, rtol=2e-5, atol=1e-4)


def test_pipeline_parallel_all_archs():
    """The GPipe pipeline is architecture-agnostic: OPT (learned positions),
    Falcon (parallel block), and Mixtral (MoE) all match single-device."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from llama3_quantization_tpu.models import forward_logits, init_params
    from llama3_quantization_tpu.models.configs import (
        TINY_FALCON,
        TINY_MIXTRAL,
        TINY_OPT,
    )
    from llama3_quantization_tpu.parallel import (
        make_pipeline_forward,
        shard_params_pipeline,
    )

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("pp",))
    for base in (TINY_OPT, TINY_FALCON, TINY_MIXTRAL):
        cfg = dataclasses.replace(base, num_layers=2)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
        ref = forward_logits(params, toks, cfg)
        out = make_pipeline_forward(cfg, mesh, n_microbatches=2)(
            shard_params_pipeline(params, mesh, cfg), toks
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4,
            err_msg=f"pipeline mismatch for {base.arch}",
        )


def test_tp_overlap_forward():
    """Megatron-SP TP forward with ring-overlapped collectives == the
    single-device forward (fp and quantized weights)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from llama3_quantization_tpu.models import (
        forward_logits,
        init_params,
        quantize_model_rtn,
    )
    from llama3_quantization_tpu.models.configs import TINY_LLAMA
    from llama3_quantization_tpu.parallel import make_mesh, make_tp_overlap_forward
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, cfg.vocab_size)
    mesh = make_mesh(tp=2, devices=jax.devices()[:2])

    ref = forward_logits(params, toks, cfg)
    out = make_tp_overlap_forward(cfg, mesh)(params, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    qp = quantize_model_rtn(params, cfg, QuantSpec(n_bits=8, group_size=32))
    qref = forward_logits(qp, toks, cfg)
    qout = make_tp_overlap_forward(cfg, mesh)(qp, toks)
    np.testing.assert_allclose(np.asarray(qout), np.asarray(qref), atol=1e-4)


def test_flash_decode_kernel_sharded_matches_single_replica():
    """Partition-aware flash decode: with `set_decode_mesh`, the Pallas
    kernel call is shard_map-wrapped (batch on dp, KV head groups on tp)
    and reproduces the single-replica kernel decode on both the int8 and
    the fp cache — the kernel grid is embarrassingly parallel over (B, G),
    so per-shard programs see exactly the same numbers."""
    from llama3_quantization_tpu.models import (
        decode_step,
        init_kv_cache,
        set_decode_kernel,
        set_decode_mesh,
    )

    cfg = TINY_LLAMA  # 4 q heads over 2 kv groups
    dmesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, cfg.vocab_size)

    for quantized in (True, False):
        outs = {}
        for m in (None, dmesh):
            set_decode_kernel("interpret")
            set_decode_mesh(m)
            try:
                p = shard_params(params, dmesh, cfg) if m is not None else params
                cache = init_kv_cache(cfg, 2, 16, quantized=quantized)
                lg, cache = decode_step(p, cache, toks[:, :4], jnp.int32(0), cfg)
                seq = [lg[:, -1]]
                for i in range(4, 10):
                    lg, cache = decode_step(
                        params if m is None else p, cache, toks[:, i : i + 1],
                        jnp.int32(i), cfg,
                    )
                    seq.append(lg[:, 0])
                outs[m is not None] = jnp.stack(seq)
            finally:
                set_decode_kernel("auto")
                set_decode_mesh(None)
        np.testing.assert_allclose(
            np.asarray(outs[True]), np.asarray(outs[False]), rtol=2e-4, atol=2e-4
        )


def test_flash_decode_mesh_fallback_when_shapes_dont_divide(mesh):
    """kv_heads (2) % tp (4) != 0 -> the decode step silently takes the
    eager XLA path under the mesh and still matches the kernel-off run."""
    from llama3_quantization_tpu.models import (
        decode_step,
        init_kv_cache,
        set_decode_kernel,
        set_decode_mesh,
    )

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)

    def run(kernel_mode, m):
        set_decode_kernel(kernel_mode)
        set_decode_mesh(m)
        try:
            cache = init_kv_cache(cfg, 2, 16, quantized=True)
            lg, cache = decode_step(params, cache, toks[:, :4], jnp.int32(0), cfg)
            for i in range(4, 8):
                lg, cache = decode_step(
                    params, cache, toks[:, i : i + 1], jnp.int32(i), cfg
                )
            return lg[:, 0]
        finally:
            set_decode_kernel("auto")
            set_decode_mesh(None)

    ref = run(False, None)  # XLA dequant path
    out = run("interpret", mesh)  # mesh set, shapes don't divide -> same path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ring_attention_grouped_probs_quant_matches_eager():
    """Grouped rq.p under ring attention == the eager path when the ring
    block width is a multiple of group_size (each group then lies inside
    one block, so its dynamic min/max is block-local and globally exact);
    indivisible group sizes are rejected."""
    from jax.sharding import Mesh

    from llama3_quantization_tpu.models import forward_logits, init_params
    from llama3_quantization_tpu.models.configs import TINY_LLAMA
    from llama3_quantization_tpu.models.transformer import RuntimeQuantConfig
    from llama3_quantization_tpu.parallel import make_sp_forward
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, cfg.vocab_size)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))  # block width 8
    base = forward_logits(params, toks, cfg)

    rq = RuntimeQuantConfig(p=QuantSpec(n_bits=4, group_size=4))
    ref = forward_logits(params, toks, cfg, rq)
    out = make_sp_forward(cfg, mesh, rq=rq)(params, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
    assert float(jnp.max(jnp.abs(ref - base))) > 1e-3  # the hook bites

    with pytest.raises(NotImplementedError, match="multiple of group_size"):
        bad = RuntimeQuantConfig(p=QuantSpec(n_bits=4, group_size=3))
        make_sp_forward(cfg, mesh, rq=bad)(params, toks)


def test_sharded_gptq_solve_matches_single_device():
    """TP-sharded GPTQ (columns split over the mesh, Hessian replicated)
    must be bit-identical to the single-device solve, and the dp-sharded
    Hessian accumulation must match the streaming one."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from llama3_quantization_tpu.parallel import (
        sharded_gptq_quantize_weight, sharded_hessian_update)
    from llama3_quantization_tpu.quant.gptq import (
        gptq_quantize_weight, hessian_init, hessian_update)
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.qtensor import dequantize

    rng = np.random.default_rng(0)
    K, N = 64, 48
    X = rng.standard_normal((4, 32, K)).astype(np.float32)
    W = (rng.standard_normal((K, N)) * 0.1).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("tp",))

    # dp-sharded Hessian == streaming Hessian over the same samples
    hs_seq = hessian_init(K)
    for i in range(4):
        hs_seq = hessian_update(hs_seq, jnp.asarray(X[i]))
    mesh_dp = Mesh(np.array(jax.devices())[:4].reshape(4), ("dp",))
    hs_sh = sharded_hessian_update(hessian_init(K), jnp.asarray(X), mesh_dp, axis="dp")
    assert hs_sh.nsamples == hs_seq.nsamples
    np.testing.assert_allclose(np.asarray(hs_sh.H), np.asarray(hs_seq.H),
                               rtol=1e-5, atol=1e-5)

    spec = QuantSpec(n_bits=4, group_size=16)
    qt_ref, err_ref = gptq_quantize_weight(
        jnp.asarray(W), hs_seq.H, spec, blocksize=16, pack=True)
    qt_sh, err_sh = sharded_gptq_quantize_weight(
        jnp.asarray(W), hs_sh.H, spec, mesh, blocksize=16, pack=True)
    np.testing.assert_array_equal(np.asarray(qt_sh.data), np.asarray(qt_ref.data))
    np.testing.assert_allclose(np.asarray(qt_sh.scale), np.asarray(qt_ref.scale),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dequantize(qt_sh)), np.asarray(dequantize(qt_ref)), atol=1e-6)
    np.testing.assert_allclose(float(err_sh), float(err_ref), rtol=1e-4)
