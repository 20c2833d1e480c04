"""Deterministic study-table reproduction (golden-number fixtures).

The reference validates itself by reproducing the paper's PPL/accuracy
tables on real checkpoints (`/root/reference/README.md:43-69`); this
environment has no weights and no egress, so this tool reproduces the
SAME table *shape* — every quantization method x {WikiText-2-style PPL,
CommonSenseQA-style accuracies} — on the tiny model with the vendored
corpus (`tests/fixtures/wikitext2_slice.txt`) and injected task docs.
Everything is seeded: the table is bit-stable across runs and machines,
so `tests/fixtures/golden_study.json` pins the full
quantize->calibrate->evaluate stack, including `eval/data.py`'s
detokenizer/join/RNG sampling and the harness prompt pipeline.

Usage:
    python tools/reproduce_study.py            # print the table
    python tools/reproduce_study.py --check    # compare vs golden JSON
    python tools/reproduce_study.py --update   # rewrite golden JSON

For real checkpoints, see docs/RUNBOOK.md (cli.py commands per
BASELINE.json config).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "tests", "fixtures")
GOLDEN = os.path.join(FIXTURES, "golden_study.json")
CORPUS = os.path.join(FIXTURES, "wikitext2_slice.txt")

#: methods x per-method kwargs sized for the tiny model
METHODS = {
    "fp": None,
    "rtn": {},
    "gptq": {"blocksize": 32},
    "awq": {},
    "smoothquant": {},
    "omniquant": {"epochs": 1},
    "hqq": {"iters": 10},
    # blocksize2=4: the tiny model's 64x64 linears must be divisible by
    # blocksize2*64 or ICQ skips them (the reference's bnb behavior)
    "irqlora": {"tau_n": 10, "blocksize2": 4},
    "mixed": {"blocksize": 32},
    # execution-backend rows (round 4): the SAME rtn quantization run
    # through the fast TPU paths — s4 (native-int4 BD dots) and a8
    # (per-group s8 MXU dots), both with per-token int8 activations. A
    # real checkpoint therefore exercises the fast paths, not just the
    # reference-parity dequant backend (VERDICT round-3 item 9).
    "rtn_s4": {},
    "rtn_a8": {},
}

SEQLEN = 64
NSAMPLES_CALIB = 8
PPL_LIMIT = 24  # windows

# deterministic offline task docs (same shapes as the HF datasets)
PIQA_DOCS = [
    {"goal": f"how to {v} a {n}", "sol1": f"use the {a} {t}", "sol2": f"ask a {p}",
     "label": i % 2}
    for i, (v, n, a, t, p) in enumerate(
        [("clean", "window", "soft", "cloth", "neighbour"),
         ("fix", "chair", "small", "hammer", "carpenter"),
         ("open", "jar", "rubber", "grip", "friend"),
         ("plant", "seed", "garden", "trowel", "gardener"),
         ("wrap", "gift", "bright", "paper", "clerk"),
         ("store", "rice", "sealed", "jar", "grocer")])
]
ARC_DOCS = [
    {"id": str(i), "question": f"which element has number {i + 1}?",
     "choices": {"text": ["helium", "hydrogen", "carbon"], "label": ["A", "B", "C"]},
     "answerKey": "B"}
    for i in range(5)
]
TASK_DATA = {
    "piqa": {"train": PIQA_DOCS, "validation": PIQA_DOCS},
    "arc_easy": {"train": ARC_DOCS, "validation": ARC_DOCS, "test": ARC_DOCS},
}


def run_study(methods=None, via_hf_checkpoint=None):
    """`via_hf_checkpoint`: a directory path — the tiny model is first
    SAVED as a HF-format checkpoint there and re-loaded through
    `from_hf_checkpoint` before quantization, so the study numbers also
    pin the checkpoint save/load path (fp32 round-trips bit-exactly: the
    goldens must match either way)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama3_quantization_tpu.api import quantize
    from llama3_quantization_tpu.eval.data import SyntheticTokenizer, get_loaders
    from llama3_quantization_tpu.eval.harness import JAXLM, simple_evaluate
    from llama3_quantization_tpu.eval.ppl import compute_ppl
    from llama3_quantization_tpu.models import TINY_LLAMA, init_params
    from llama3_quantization_tpu.quant import QuantSpec

    cfg = TINY_LLAMA
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    if via_hf_checkpoint:
        from llama3_quantization_tpu.models.hf_loader import (
            from_hf_checkpoint,
            save_hf_checkpoint,
        )

        save_hf_checkpoint(params, cfg, via_hf_checkpoint)
        params, cfg = from_hf_checkpoint(via_hf_checkpoint, dtype=jnp.float32)
    tok = SyntheticTokenizer()
    with open(CORPUS) as f:
        text = f.read()
    # reference split discipline: sample calibration from the front half,
    # evaluate PPL on the back half (datautils.py train/test splits)
    cut = len(text) // 2
    trainloader, testenc = get_loaders(
        "wikitext2", nsamples=NSAMPLES_CALIB, seed=0, seqlen=SEQLEN,
        tokenizer=tok, train_text=text[:cut], test_text=text[cut:],
    )
    calib = np.stack([inp[0] for inp, _ in trainloader])

    class Tok:
        eot_token_id = 0
        vocab_size = tok.vocab_size

        def encode(self, s):
            return tok.encode(s).tolist()

        def decode(self, ids):
            return tok.decode(ids)

    import contextlib

    from llama3_quantization_tpu.ops import matmul as mm

    spec = QuantSpec(n_bits=4, group_size=32)
    out = {}
    for method, kwargs in (methods or METHODS).items():
        if method.startswith("seq2seq") or method == "serving":
            continue  # handled by the dedicated runners below
        exec_backend = None
        base_method = method
        if "_" in method and method.split("_")[1] in ("s4", "a8"):
            base_method, exec_backend = method.split("_", 1)
        if base_method == "fp":
            qp = params
        else:
            qp = quantize(params, cfg, method=base_method, spec=spec,
                          calib_tokens=calib,
                          pack=exec_backend != "a8",  # a8 needs s8 containers
                          **kwargs)
        bctx = mm.backend(exec_backend) if exec_backend else contextlib.nullcontext()
        with bctx:
            ppl = compute_ppl(qp, cfg, testenc, seqlen=SEQLEN, limit=PPL_LIMIT)
            lm = JAXLM(qp, cfg, Tok(), batch_size=4, max_length=SEQLEN)
            res = simple_evaluate(
                lm, ["piqa", "arc_easy"], num_fewshot=0, bootstrap_iters=2,
                task_data=TASK_DATA,
            )["results"]
        out[method] = {
            "ppl_wikitext2": round(ppl, 4),
            "piqa_acc": round(res["piqa"]["acc"], 4),
            "arc_easy_acc_norm": round(res["arc_easy"]["acc_norm"], 4),
        }
        print(f"  {method:<12} ppl={out[method]['ppl_wikitext2']:<10} "
              f"piqa={out[method]['piqa_acc']} "
              f"arc={out[method]['arc_easy_acc_norm']}", flush=True)

    s2_sel = (
        SEQ2SEQ_METHODS if methods is None
        else tuple(m[len("seq2seq_"):] for m in methods if m.startswith("seq2seq"))
    )
    if s2_sel:
        out.update(_seq2seq_rows(calib, Tok, tok, s2_sel))
    if methods is None or "serving" in (methods or {}):
        out["serving_a8"] = _serving_row(params, cfg, spec)
        print(f"  serving_a8   digest={out['serving_a8']['digest']} "
              f"tokens={out['serving_a8']['tokens']}", flush=True)
    return out


#: seq2seq study rows (round 5): the SAME table shape over the T5 trunk —
#: fp / rtn / gptq (every quantizer api.quantize accepts for seq2seq)
SEQ2SEQ_METHODS = ("fp", "rtn", "gptq")


def _seq2seq_rows(calib, Tok, tok, selected=None):
    import jax
    import jax.numpy as jnp

    from llama3_quantization_tpu.api import quantize
    from llama3_quantization_tpu.eval.harness import simple_evaluate
    from llama3_quantization_tpu.eval.harness.lm import Seq2SeqJAXLM
    from llama3_quantization_tpu.models.seq2seq import (
        Seq2SeqConfig,
        init_seq2seq_params,
    )
    from llama3_quantization_tpu.quant import QuantSpec

    s2cfg = Seq2SeqConfig(
        vocab_size=tok.vocab_size, d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_layers=2, num_decoder_layers=2, rel_buckets=8,
    )
    s2params = init_seq2seq_params(s2cfg, jax.random.PRNGKey(7))
    spec = QuantSpec(n_bits=4, group_size=8)
    out = {}
    for method in (selected or SEQ2SEQ_METHODS):
        if method == "fp":
            qp = s2params
        else:
            qp = quantize(s2params, s2cfg, method=method, spec=spec,
                          calib_tokens=calib, batch_size=4)
        lm = Seq2SeqJAXLM(qp, s2cfg, Tok(), batch_size=4, max_length=SEQLEN)
        res = simple_evaluate(
            lm, ["piqa", "arc_easy"], num_fewshot=0, bootstrap_iters=2,
            task_data=TASK_DATA,
        )["results"]
        row = {
            "piqa_acc": round(res["piqa"]["acc"], 4),
            "arc_easy_acc_norm": round(res["arc_easy"]["acc_norm"], 4),
        }
        out[f"seq2seq_{method}"] = row
        print(f"  seq2seq_{method:<5} piqa={row['piqa_acc']} "
              f"arc={row['arc_easy_acc_norm']}", flush=True)
    return out


def _serving_row(params, cfg, spec):
    """Continuous-batching engine digest (round 5): fixed request mix
    through ServingEngine.run_pipelined on the a8 exec backend + int8 KV
    — pins the engine's admission/pre-free/drain machinery end-to-end
    (greedy streams are deterministic, so the digest is golden-able)."""
    import hashlib

    import numpy as np

    from llama3_quantization_tpu.api import quantize
    from llama3_quantization_tpu.ops import matmul as mm
    from llama3_quantization_tpu.serving.engine import ServingEngine

    qp = quantize(params, cfg, method="rtn", spec=spec, pack=False)
    with mm.backend("a8"):
        eng = ServingEngine(qp, cfg, max_slots=2, max_len=SEQLEN,
                            quantized_cache=8)
        rng = np.random.default_rng(3)
        lengths = [(int(rng.integers(4, 12)), int(rng.integers(6, 14)))
                   for _ in range(6)]
        for plen, glen in lengths:
            eng.submit(list(rng.integers(0, cfg.vocab_size, plen)), glen, None)
        eng.run_pipelined(4)
    streams = [eng.requests[rid].generated for rid in sorted(eng.requests)]
    blob = ";".join(",".join(map(str, s)) for s in streams)
    return {
        "digest": hashlib.sha1(blob.encode()).hexdigest()[:16],
        "tokens": sum(len(s) for s in streams),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--methods", type=str, default=None,
                    help="comma-separated subset")
    args = ap.parse_args()

    methods = None
    if args.methods:
        known = set(METHODS) | {f"seq2seq_{m}" for m in SEQ2SEQ_METHODS} | {"serving"}
        names = args.methods.split(",")
        unknown = [m for m in names if m not in known]
        if unknown:
            raise SystemExit(f"unknown methods {unknown}; choose from {sorted(known)}")
        methods = {m: METHODS.get(m, {}) for m in names}
    table = run_study(methods)

    if args.update:
        with open(GOLDEN, "w") as f:
            json.dump(table, f, indent=2, sort_keys=True)
        print(f"wrote {GOLDEN}")
        return
    if args.check:
        with open(GOLDEN) as f:
            golden = json.load(f)
        bad = []
        for m, row in table.items():
            for k, v in row.items():
                g = golden[m][k]
                if isinstance(v, (str, int)):
                    # serving digest/count rows: exact match (greedy
                    # streams are deterministic)
                    if v != g:
                        bad.append(f"{m}.{k}: got {v}, golden {g}")
                    continue
                tol = 2e-3 * max(1.0, abs(g))
                if abs(v - g) > tol:
                    bad.append(f"{m}.{k}: got {v}, golden {g}")
        if bad:
            raise SystemExit("golden mismatch:\n  " + "\n  ".join(bad))
        print(f"golden check OK ({len(table)} methods)")


if __name__ == "__main__":
    main()
