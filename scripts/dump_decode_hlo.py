#!/usr/bin/env python
"""Dump the optimized HLO of the b8 a8 decode generate program and locate
the hot fusions from the round-5 trace (bitcast_add_fusion.3 at
2.54 ms/step = 23% of the loop body — the round-2 unattributed suspect).
"""
import os
import re
import sys
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llama3_quantization_tpu.models import LLAMA3_8B
from llama3_quantization_tpu.models.synthetic import init_quantized_params
from llama3_quantization_tpu.models.transformer import greedy_generate, init_kv_cache
from llama3_quantization_tpu.ops import matmul as mm
from llama3_quantization_tpu.quant import QuantSpec
from llama3_quantization_tpu.quant.serving import fuse_for_decode

NAMES = sys.argv[1:] or ["bitcast_add_fusion.3", "fusion.207", "fusion.192",
                         "fusion.204", "fusion.178", "fusion.200", "fusion.202"]


def main():
    mm.set_backend("a8")
    cfg = LLAMA3_8B
    spec = QuantSpec(n_bits=4, group_size=128)
    params = init_quantized_params(cfg, spec, pack=False, percol_s8=True,
                                   head_s8=True)
    params = fuse_for_decode(params, cfg)
    cache = init_kv_cache(cfg, 8, 512, quantized=8)
    gen = jax.jit(partial(greedy_generate, cfg=cfg, n_steps=256),
                  donate_argnums=(1,))
    tok = jnp.zeros((8, 1), jnp.int32)
    lowered = gen.lower(params, cache, tok, jnp.int32(0))
    txt = lowered.compile().as_text()
    print(f"HLO text: {len(txt)/1e6:.1f} MB", file=sys.stderr)
    lines = txt.splitlines()
    # fusion computations are defined as %fused_computation... and called
    # as %name = fusion(...), kind=..., calls=...
    for name in NAMES:
        pat = re.compile(rf"%{re.escape(name)} = ")
        for i, ln in enumerate(lines):
            if pat.search(ln):
                print(f"\n=== {name} ===")
                print(ln.strip()[:600])
                m = re.search(r"calls=%?([\w.\-]+)", ln)
                if m:
                    callee = m.group(1)
                    # print the callee computation body (first 40 lines)
                    cpat = re.compile(rf"^%?{re.escape(callee)} ")
                    for j, l2 in enumerate(lines):
                        if cpat.match(l2.lstrip()):
                            for k in range(j, min(j + 30, len(lines))):
                                print(lines[k][:240])
                                if lines[k].strip() == "}":
                                    break
                            break
                break
    return 0


if __name__ == "__main__":
    sys.exit(main())
