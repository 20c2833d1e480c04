#!/usr/bin/env python
"""Probe: manual HBM->VMEM DMA with configurable pipeline depth.

If one in-flight DMA runs ~400 GB/s, deeper pipelining (2-4 outstanding
copies on separate semaphores) should approach the 819 GB/s bus.

Usage: python scripts/microbench_dma_depth.py [MB] [CHUNK_KB] [DEPTH...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_fn(total_rows, chunk_rows, depth, width):
    nchunks = total_rows // chunk_rows

    def kernel(hbm_ref, o_ref):
        def body(scratch, sems):
            def get_dma(slot, idx):
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(idx * chunk_rows, chunk_rows), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            for i in range(min(depth, nchunks)):
                get_dma(i, i).start()

            def loop(i, acc):
                slot = i % depth

                get_dma(slot, i).wait()
                acc = acc + scratch[slot, 0, :].astype(jnp.float32)

                nxt = i + depth

                @pl.when(nxt < nchunks)
                def _():
                    get_dma(slot, nxt).start()

                return acc

            acc = jax.lax.fori_loop(0, nchunks, loop, jnp.zeros((width,), jnp.float32))
            o_ref[0, :] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((depth, chunk_rows, width), jnp.int8),
            sems=pltpu.SemaphoreType.DMA((depth,)),
        )

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=total_rows * width,
            bytes_accessed=total_rows * width,
            transcendentals=0,
        ),
    )


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    chunk_kb = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    depths = [int(x) for x in sys.argv[3:]] or [1, 2, 4, 8]
    width = 1024
    total_rows = mb * 1024 * 1024 // width
    chunk_rows = chunk_kb * 1024 // width

    rng = np.random.default_rng(0)
    x = jnp.array(rng.integers(-128, 128, (total_rows, width)).astype(np.int8))

    for depth in depths:
        fn = jax.jit(make_fn(total_rows, chunk_rows, depth, width))
        out = fn(x)
        _ = float(out[0, 0])
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            out = fn(x)
        _ = float(out[0, 0])
        dt = (time.time() - t0) / reps
        gbs = (total_rows * width) / dt / 1e9
        print(f"  depth={depth}: {dt*1e3:.2f} ms for {mb} MB -> {gbs:5.0f} GB/s")


if __name__ == "__main__":
    main()
