"""Multi-process (DCN-axis) smoke run on localhost CPU.

The reference has no distributed backend at all (SURVEY.md §2.7); this
framework's multi-host story is `jax.distributed.initialize` + a hybrid
(dp over DCN, tp over ICI) mesh from `parallel/distributed.py`. Real pods
aren't reachable from this environment, so this tool validates the
machinery the way JAX projects do: N OS processes on localhost, each with
its own virtual CPU devices, wired through the real coordination service
and Gloo collectives — every cross-process code path (coordinator
handshake, global mesh construction, cross-process `device_put`,
collective execution, global-array fetch) is the one a TPU pod runs.

Usage:
    python tools/dcn_smoke.py            # launcher: spawns 2 workers
    python tools/dcn_smoke.py --worker I # one worker (internal)

Exercises, on a (dp=2 processes) x (tp=4 local devices) pod mesh:
  1. sharded quantized-model forward (tp-sharded weights, dp-sharded batch)
  2. one sharded LWC calibration train step (grads + AdamW over the mesh)
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROCS = 2
# tp=2: TINY_LLAMA's W4 g32 row-parallel scales have only G=2 groups on
# the sharded K axis, so the tp degree must divide 2
LOCAL_DEVICES = 2
OK_MARKER = "DCN_SMOKE_WORKER_OK"


def _worker(proc_id: int, coord: str) -> None:
    import jax

    sys.path.insert(0, REPO)
    from llama3_quantization_tpu.parallel.distributed import (
        init_distributed,
        make_pod_mesh,
    )

    init_distributed(coord, num_processes=NPROCS, process_id=proc_id)
    assert jax.process_count() == NPROCS, jax.process_count()
    assert jax.device_count() == NPROCS * LOCAL_DEVICES
    mesh = make_pod_mesh(tp=LOCAL_DEVICES)
    assert mesh.shape["dp"] == NPROCS and mesh.shape["tp"] == LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llama3_quantization_tpu.models import TINY_LLAMA, init_params
    from llama3_quantization_tpu.models.synthetic import init_quantized_params
    from llama3_quantization_tpu.parallel import make_sharded_forward, shard_params
    from llama3_quantization_tpu.parallel.train import (
        init_model_lwc,
        make_lwc_train_step,
    )
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    spec = QuantSpec(n_bits=4, group_size=32)

    # 1. sharded quantized forward: same-seed params on every process ->
    # cross-process device_put per model_pspecs; batch split over dp.
    qparams = init_quantized_params(cfg, spec, pack=True, dtype=jnp.float32)
    qsharded = shard_params(qparams, mesh, cfg)
    per_proc = 2
    rng = np.random.default_rng(0)  # same stream everywhere
    all_tokens = rng.integers(0, cfg.vocab_size, (NPROCS * per_proc, 16))
    tokens = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp", None)),
        all_tokens[proc_id * per_proc : (proc_id + 1) * per_proc].astype(np.int32),
    )
    logits = make_sharded_forward(cfg, mesh)(qsharded, tokens)
    # fetch via a fully-replicated reduction (logits themselves are sharded)
    lsum = float(
        jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(logits)
    )
    assert np.isfinite(lsum), lsum
    print(f"worker {proc_id}: sharded forward OK sum={lsum:.4f}", flush=True)

    # 2. one sharded LWC calibration step over the pod mesh
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    sharded = shard_params(params, mesh, cfg)
    wspec = QuantSpec(n_bits=4, group_size=32, lwc=True)
    lwc = init_model_lwc(sharded, cfg, wspec)
    opt, train_step = make_lwc_train_step(cfg, mesh, wspec, lr=1e-2)
    opt_state = opt.init(lwc)
    cal = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp", None)),
        rng.integers(0, cfg.vocab_size, (per_proc, 17)).astype(np.int32),
    )
    lwc, opt_state, loss = train_step(lwc, opt_state, sharded, cal)
    loss = float(loss)
    assert np.isfinite(loss), loss
    print(f"worker {proc_id}: LWC train step OK loss={loss:.4f}", flush=True)
    print(f"{OK_MARKER} proc={proc_id} loss={loss:.6f}", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(timeout: float = 600.0) -> str:
    """Spawn NPROCS workers; return combined output (raises on failure)."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    coord = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--coord", coord],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(NPROCS)
    ]
    outs = []
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
            if p.returncode != 0:
                raise RuntimeError(f"worker {i} failed (rc={p.returncode}):\n{out}")
            if OK_MARKER not in out:
                raise RuntimeError(f"worker {i} missing OK marker:\n{out}")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact PIDs we spawned, never by pattern
    # all workers must agree on the (globally reduced) loss
    losses = {o.split("loss=")[-1].split()[0].strip() for o in outs}
    if len(losses) != 1:
        raise RuntimeError(f"workers disagree on loss: {losses}")
    return "\n".join(outs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--coord", type=str, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        _worker(args.worker, args.coord)
    else:
        out = launch()
        print(out)
        print("DCN smoke: 2-process pod-mesh forward + calibration step OK")


if __name__ == "__main__":
    main()
