"""Reproduce the low-bit LLaMA3 study table (arXiv:2404.14047, Table 1).

Runs the method × bit-width matrix the reference study evaluates
(BASELINE.md rows) over one model and emits a markdown table of WikiText-2/
C4/PTB perplexity and CommonSenseQA accuracies:

    python -m llama3_quantization_tpu.tools.reproduce_study \
        --model /ckpt/Meta-Llama-3-8B --out results.md \
        --configs rtn:4:128 gptq:4:128 gptq:8: smoothquant:8:_a8 hqq:4:64

Config syntax: `method:wbits:group[_aN]` (empty group = per-channel,
`_a8` enables 8-bit runtime activation quant). Zero-egress note: needs a
local checkpoint + HF datasets cache; `--net tiny-llama --synthetic` runs
the full pipeline on synthetic data as a smoke test.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

STUDY_CONFIGS = [
    "rtn:8:", "rtn:4:128", "rtn:3:128", "rtn:2:128",
    "gptq:8:", "gptq:4:128", "gptq:3:128", "gptq:2:128",
    "awq:4:128", "awq:3:128",
    "smoothquant:8:_a8",
    "hqq:4:64", "hqq:3:64", "hqq:2:64",
    "omniquant:3:128", "omniquant:2:128",
    "irqlora:4:", "mixed:2:32",
]

CSQA_TASKS = "piqa,arc_easy,arc_challenge,hellaswag,winogrande"


def parse_config(cfg_str: str):
    act = None
    if "_a" in cfg_str:
        cfg_str, a = cfg_str.rsplit("_a", 1)
        act = int(a)
    method, wbits, group = cfg_str.split(":")
    return method, int(wbits), int(group) if group else None, act


def main(argv=None):
    p = argparse.ArgumentParser("reproduce_study")
    p.add_argument("--model", default=None)
    p.add_argument("--net", default=None)
    p.add_argument("--configs", nargs="*", default=STUDY_CONFIGS)
    p.add_argument("--tasks", default=CSQA_TASKS)
    p.add_argument("--ppl_datasets", default="wikitext2,c4,ptb")
    p.add_argument("--calib_dataset", default="wikitext2")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic calib/eval data (smoke test)")
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from ..cli import main as cli_main

    rows = []
    for cfg_str in args.configs:
        method, wbits, group, act = parse_config(cfg_str)
        cli_args = [
            "--quant_method", method, "--wbits", str(wbits),
            "--calib_dataset", "synthetic" if args.synthetic else args.calib_dataset,
            "--nsamples", str(args.nsamples), "--seqlen", str(args.seqlen),
            "--eval_ppl", "--ppl_datasets", args.ppl_datasets,
            "--limit", str(args.limit),
        ]
        if group:
            cli_args += ["--group_size", str(group)]
        if act:
            cli_args += ["--abits", str(act)]
        if args.tasks and not args.synthetic:
            cli_args += ["--tasks", args.tasks]
        if args.model:
            cli_args += ["--model", args.model]
        else:
            cli_args += ["--net", args.net or "tiny-llama"]
        print(f"=== {cfg_str} ===", file=sys.stderr)
        t0 = time.time()
        try:
            results = cli_main(cli_args)
        except Exception as e:  # record and continue the sweep
            print(f"{cfg_str} FAILED: {e}", file=sys.stderr)
            rows.append((cfg_str, {"error": str(e)}))
            continue
        results["_seconds"] = round(time.time() - t0, 1)
        rows.append((cfg_str, results))

    # markdown table
    ppl_cols = args.ppl_datasets.split(",")
    task_cols = [t for t in args.tasks.split(",") if t] if not args.synthetic else []
    header = "| config | " + " | ".join(ppl_cols + task_cols) + " |"
    sep = "|" + "---|" * (1 + len(ppl_cols) + len(task_cols))
    lines = [header, sep]
    for cfg_str, res in rows:
        cells = []
        for c in ppl_cols:
            v = res.get(c)
            cells.append(f"{v:.2f}" if isinstance(v, float) else "—")
        for t in task_cols:
            v = res.get(t, {})
            acc = v.get("acc") if isinstance(v, dict) else None
            cells.append(f"{acc*100:.1f}" if isinstance(acc, float) else "—")
        lines.append(f"| {cfg_str} | " + " | ".join(cells) + " |")
    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n\n```json\n" + json.dumps(dict(rows), default=str, indent=1) + "\n```\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
