"""Unified CLI — the `main.py` equivalent (`/root/reference/main.py:202-420`).

    python -m llama3_quantization_tpu.cli \
        --model /path/to/Meta-Llama-3-8B --quant_method gptq \
        --wbits 4 --group_size 128 --calib_dataset wikitext2 \
        --eval_ppl --tasks piqa,arc_easy

Flag names follow the reference so run scripts translate 1:1. Differences:
one driver covers all methods (no separate llama.py/autogptq.py/
quantizehqq.py), models load from local checkpoints only (zero-egress), and
`--net tiny-llama`-style named configs enable checkpoint-free smoke runs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("llama3_quantization_tpu")
    p.add_argument("--model", type=str, default=None, help="local HF checkpoint dir")
    p.add_argument("--net", type=str, default=None, help="named config (tiny-llama, opt-125m, …)")
    p.add_argument("--quant_method", default="rtn",
                   choices=["rtn", "gptq", "awq", "smoothquant", "hqq", "omniquant", "irqlora", "mixed", "none"])
    p.add_argument("--wbits", type=int, default=4)
    p.add_argument("--abits", type=int, default=16)
    p.add_argument("--group_size", type=int, default=None)
    p.add_argument("--symmetric", action="store_true")
    p.add_argument("--disable_zero_point", action="store_true")
    p.add_argument("--calib_dataset", default="wikitext2",
                   choices=["wikitext2", "ptb", "c4", "mix", "pile",
                            "ptb-new", "c4-new", "synthetic"])
    p.add_argument("--pile_data_file", default=None,
                   help="local val.jsonl(.zst) for --calib_dataset pile "
                        "(the reference hard-codes a cluster path)")
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--eval_ppl", action="store_true")
    p.add_argument("--ppl_datasets", default="wikitext2,c4,ptb")
    p.add_argument("--tasks", default="")
    p.add_argument("--num_fewshot", type=int, default=0)
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=8)
    # omniquant
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lwc", action="store_true")
    p.add_argument("--let", action="store_true")
    p.add_argument("--lwc_lr", type=float, default=1e-2)
    p.add_argument("--let_lr", type=float, default=5e-3)
    p.add_argument("--aug_loss", action="store_true")
    # gptq
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--act_order", action="store_true")
    p.add_argument("--blocksize", type=int, default=128)
    p.add_argument("--true_sequential", action="store_true")
    p.add_argument("--observe", action="store_true",
                   help="per-linear SNR diagnostics table (reference llama.py --observe)")
    # hqq
    p.add_argument("--hqq_iters", type=int, default=20)
    # distribution
    p.add_argument("--tp", type=int, default=None, help="tensor-parallel size")
    p.add_argument("--dp", type=int, default=None, help="data-parallel size")
    p.add_argument("--sp", type=int, default=None,
                   help="sequence-parallel size for PPL (ring attention)")
    # io
    p.add_argument("--save_dir", default=None)
    p.add_argument("--output_json", default=None)
    p.add_argument("--real_quant", action="store_true", default=True,
                   help="always on: weights are stored packed/int8 (reference "
                        "needs this flag to opt into AutoGPTQ kernels)")
    p.add_argument("--use_cache", default=None, help="sqlite LM response cache path")
    p.add_argument("--decontamination_ngrams_path", default=None)
    p.add_argument("--serving_recode", action="store_true",
                   help="recode weights to per-column s8 + a8 backend (fast decode)")
    p.add_argument("--mixed_topk", type=int, default=4,
                   help="worst linears upgraded to W8 for --quant_method mixed")
    p.add_argument("--recode_head", action="store_true",
                   help="with --serving_recode: also recode lm_head to s8")
    p.add_argument("--fuse_decode", action="store_true",
                   help="with --serving_recode: horizontally fuse qkv and "
                        "gate/up projections (single-replica decode)")
    p.add_argument("--moe_capacity", type=float, default=None,
                   help="GShard-style MoE capacity factor (e.g. 1.25); "
                        "default dense exact routing")
    return p


def load_model(args):
    import jax

    from .models import NAMED_CONFIGS, init_params
    from .models.hf_loader import from_hf_checkpoint

    if args.model:
        import json as _json
        import os as _os

        try:
            with open(_os.path.join(args.model, "config.json")) as f:
                mt = _json.load(f).get("model_type")
        except OSError:
            mt = None
        if mt in ("t5", "mt5", "longt5"):
            # the reference's T0-3B seq2seq special case
            # (`models/LMClass.py:35-39`) — native T5 trunk (round 4)
            from .models.seq2seq import from_hf_seq2seq

            return from_hf_seq2seq(args.model)
        return from_hf_checkpoint(args.model)
    if args.net:
        cfg = NAMED_CONFIGS[args.net]
        import jax.numpy as jnp

        params = init_params(cfg, jax.random.PRNGKey(args.seed), dtype=jnp.float32)
        return params, cfg
    raise SystemExit("pass --model <dir> or --net <named-config>")


def get_calib(args, tokenizer, vocab_size: int) -> np.ndarray:
    if args.calib_dataset == "synthetic" or tokenizer is None:
        rng = np.random.default_rng(args.seed)
        return rng.integers(0, vocab_size, (args.nsamples, args.seqlen))
    from .eval.data import get_loaders

    kw = {}
    if args.calib_dataset == "pile" and getattr(args, "pile_data_file", None):
        kw["data_file"] = args.pile_data_file
    loader, _ = get_loaders(
        args.calib_dataset, nsamples=args.nsamples, seed=args.seed,
        seqlen=args.seqlen, tokenizer=tokenizer, **kw,
    )
    return np.concatenate([inp for inp, _ in loader], axis=0)


def _main_seq2seq(args, params, cfg):
    """Seq2seq (T5/T0) driver path: RTN or GPTQ weight quantization
    (round 5 — `quant/seq2seq_calibration.py`) + harness task eval
    through `Seq2SeqJAXLM`. PPL streams and the remaining calibration
    algorithms (awq/omniquant/...) are decoder-only surface (the
    reference evaluates T0 on tasks only, `new_scripts/` has no T0 PPL
    job)."""
    from .models.seq2seq import quantize_seq2seq_rtn
    from .quant.quantizer import QuantSpec

    tokenizer = None
    if args.model:
        from .eval.data import HFTokenizer

        try:
            tokenizer = HFTokenizer(args.model)
        except Exception as e:
            print(f"[cli] tokenizer unavailable: {e}", file=sys.stderr)
    if args.quant_method not in ("none",) and args.wbits < 16:
        if args.quant_method not in ("rtn", "gptq"):
            raise SystemExit(
                f"seq2seq supports --quant_method rtn|gptq (got "
                f"{args.quant_method}); the remaining calibration "
                "algorithms are decoder-only"
            )
        spec = QuantSpec(
            n_bits=args.wbits, group_size=args.group_size,
            symmetric=args.symmetric, disable_zero_point=args.disable_zero_point,
        )
        if args.quant_method == "gptq":
            from .quant.seq2seq_calibration import (
                gptq_quantize_seq2seq,
                split_calib_pairs,
            )

            calib = get_calib(args, tokenizer, cfg.vocab_size)
            enc_t, dec_t = split_calib_pairs(calib)
            params = gptq_quantize_seq2seq(
                params, cfg, enc_t, dec_t, spec,
                actorder=getattr(args, "act_order", False),
            )
        else:
            params = quantize_seq2seq_rtn(params, cfg, spec)
        print(
            f"[cli] {args.quant_method} W{args.wbits} g{args.group_size} "
            "applied (seq2seq)",
            file=sys.stderr,
        )
    if args.eval_ppl:
        print("[cli] --eval_ppl is decoder-only; skipping for seq2seq",
              file=sys.stderr)
    if args.tasks:
        from .eval.data import ByteTokenizer
        from .eval.harness import make_table, simple_evaluate
        from .eval.harness.lm import Seq2SeqJAXLM

        lm = Seq2SeqJAXLM(params, cfg, tokenizer or ByteTokenizer(),
                          batch_size=args.batch_size)
        res = simple_evaluate(lm, args.tasks.split(","),
                              num_fewshot=args.num_fewshot)
        print(make_table(res))
    return None


def main(argv=None):
    args = build_parser().parse_args(argv)
    t0 = time.time()
    params, cfg = load_model(args)
    from .models.seq2seq import Seq2SeqConfig

    is_seq2seq = isinstance(cfg, Seq2SeqConfig)
    arch = "t5-seq2seq" if is_seq2seq else cfg.arch
    nl = cfg.num_layers
    print(f"[cli] model ready ({arch}, {nl}L) in {time.time()-t0:.1f}s",
          file=sys.stderr)
    if is_seq2seq:
        return _main_seq2seq(args, params, cfg)
    if args.seqlen > cfg.max_position_embeddings:
        # reference pins seqlen to the model's position table
        # (`models/LMClass.py:34,43`)
        print(f"[cli] seqlen {args.seqlen} > max_position_embeddings "
              f"{cfg.max_position_embeddings}; clamping", file=sys.stderr)
        args.seqlen = cfg.max_position_embeddings

    tokenizer = None
    if args.model:
        from .eval.data import HFTokenizer

        try:
            tokenizer = HFTokenizer(args.model)
        except Exception as e:
            print(f"[cli] tokenizer unavailable: {e}", file=sys.stderr)

    from .models.transformer import RuntimeQuantConfig
    from .quant.quantizer import QuantSpec

    rq = RuntimeQuantConfig(
        act=QuantSpec(n_bits=args.abits) if args.abits < 16 else None
    )

    if args.quant_method not in ("none",) and args.wbits < 16:
        spec = QuantSpec(
            n_bits=args.wbits,
            group_size=args.group_size,
            symmetric=args.symmetric,
            disable_zero_point=args.disable_zero_point,
        )
        calib = None
        if args.quant_method in ("gptq", "awq", "smoothquant", "omniquant", "mixed"):
            calib = get_calib(args, tokenizer, cfg.vocab_size)
        from .api import quantize

        kw = {}
        snr_rows: list = []
        if args.quant_method == "gptq":
            kw = dict(blocksize=args.blocksize, percdamp=args.percdamp,
                      actorder=args.act_order, true_sequential=args.true_sequential)
            if args.observe:
                kw["snr_log"] = snr_rows
        elif args.quant_method == "omniquant":
            kw = dict(epochs=args.epochs, lwc_lr=args.lwc_lr, aug_loss=args.aug_loss,
                      let=args.let, let_lr=args.let_lr)
        elif args.quant_method == "hqq":
            kw = dict(iters=args.hqq_iters)
        elif args.quant_method == "mixed":
            # Observer-driven mixed precision needs unpacked containers
            kw = dict(pack=False, blocksize=args.blocksize, topk=args.mixed_topk)
        t0 = time.time()
        params = quantize(params, cfg, args.quant_method, spec, calib, **kw)
        print(f"[cli] {args.quant_method} W{args.wbits}"
              f"{'g'+str(args.group_size) if args.group_size else ''} "
              f"in {time.time()-t0:.1f}s", file=sys.stderr)
        if snr_rows:
            from .quant.gptq import format_snr_table

            print(format_snr_table(snr_rows), file=sys.stderr)

    if args.moe_capacity is not None:
        from .models import set_moe_capacity

        set_moe_capacity(args.moe_capacity)
        print(f"[cli] MoE capacity dispatch, factor {args.moe_capacity}", file=sys.stderr)

    if args.serving_recode:
        from .ops import matmul as mm
        from .quant.serving import recode_model_s8

        params = recode_model_s8(params, cfg, include_head=args.recode_head)
        mm.set_backend("a8")
        print("[cli] serving recode: per-column s8 weights, a8 backend", file=sys.stderr)
        if args.fuse_decode:
            if args.tp or args.dp:
                raise SystemExit("--fuse_decode is single-replica only (no --tp/--dp)")
            from .quant.serving import fuse_for_decode

            params = fuse_for_decode(params, cfg)
            print("[cli] fused qkv + gate/up projections", file=sys.stderr)

    if args.tp or args.dp:
        from .parallel import make_mesh, shard_params

        mesh = make_mesh(dp=args.dp, tp=args.tp)
        params = shard_params(params, mesh, cfg)
        # partition-aware flash decode: the kernel call is shard_map-wrapped
        # over this mesh (batch on dp, KV head groups on tp); shapes that
        # don't divide fall back to the eager path automatically
        from .models import set_decode_mesh

        set_decode_mesh(mesh)
        print(f"[cli] sharded over mesh {dict(mesh.shape)}", file=sys.stderr)

    results = {}
    if args.eval_ppl:
        from .eval.data import get_loaders
        from .eval.ppl import eval_ppl_suite

        streams = {}
        for ds in args.ppl_datasets.split(","):
            if tokenizer is None:
                rng = np.random.default_rng(0)
                streams[ds] = rng.integers(0, cfg.vocab_size, (1, args.seqlen * 4))
            else:
                _, testenc = get_loaders(ds, seed=args.seed, seqlen=args.seqlen,
                                         tokenizer=tokenizer)
                streams[ds] = np.asarray(testenc)
        limit = None if args.limit == -1 else args.limit
        step_fn = None
        if args.sp:
            import numpy as _np
            from jax.sharding import Mesh

            from .eval.ppl import compute_ppl, sp_windowed_nll_fn

            import jax as _jax

            smesh = Mesh(_np.array(_jax.devices()[: args.sp]).reshape(args.sp), ("sp",))
            step_fn = sp_windowed_nll_fn(cfg, smesh, rq=rq)
            print(f"[cli] PPL under ring attention, sp={args.sp}", file=sys.stderr)
            results.update({
                name: compute_ppl(params, cfg, enc, args.seqlen, rq, limit, step_fn=step_fn)
                for name, enc in streams.items()
            })
        else:
            results.update(
                eval_ppl_suite(params, cfg, streams, seqlen=args.seqlen, rq=rq, limit=limit)
            )
        for k, v in results.items():
            print(f"[cli] {k} ppl = {v:.4f}", file=sys.stderr)

    if args.tasks:
        from .eval.data import ByteTokenizer
        from .eval.harness import JAXLM, make_table, simple_evaluate

        lm = JAXLM(params, cfg, tokenizer or ByteTokenizer(), rq=rq,
                   batch_size=args.batch_size)
        if args.use_cache:
            from .eval.harness import CachingLM

            lm = CachingLM(lm, args.use_cache)
        # build the task dict up front so an offline-unavailable dataset
        # skips that task (with a warning) instead of killing the run
        from .eval.harness.evaluator import pattern_match
        from .eval.harness.tasks import TASK_REGISTRY

        requested = [t for t in args.tasks.split(",") if t]
        names = pattern_match(requested, list(TASK_REGISTRY))
        unknown = set(requested) - set(names) - {
            t for t in requested if any(c in t for c in "*?[")
        }
        if unknown:
            raise SystemExit(f"unknown tasks: {sorted(unknown)}")
        task_dict = {}
        for name in names:
            try:
                task_dict[name] = TASK_REGISTRY[name]()
            except RuntimeError as e:
                print(f"[cli] skipping task {name}: {e}", file=sys.stderr)
        t_res = simple_evaluate(
            lm, tasks=task_dict, num_fewshot=args.num_fewshot,
            limit=None if args.limit == -1 else args.limit,
            decontamination_ngrams_path=args.decontamination_ngrams_path,
        )
        results.update(t_res["results"])
        print(make_table(t_res), file=sys.stderr)
        if any(t.startswith("hendrycksTest") for t in args.tasks.split(",")):
            from .eval.mmlu_categories import mmlu_rollup

            roll = mmlu_rollup(t_res["results"])
            results.update(roll)
            for k, v in roll.items():
                print(f"[cli] {k} = {v:.4f}", file=sys.stderr)

    if args.save_dir:
        from .models.hf_loader import save_checkpoint

        save_checkpoint(params, cfg, args.save_dir)
        print(f"[cli] saved to {args.save_dir}", file=sys.stderr)

    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(results, f, indent=2, default=str)
        print(f"[cli] results written to {args.output_json}", file=sys.stderr)

    print(json.dumps(results, default=str))
    return results


if __name__ == "__main__":
    main()
