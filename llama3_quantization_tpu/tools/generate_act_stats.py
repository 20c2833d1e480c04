"""Generate activation scale/shift statistics for SmoothQuant/LET.

Equivalent of the offline tool that produces the reference's
`act_scales/{net}.pt` and `act_shifts/{net}.pt` artifacts (loaded at
`/root/reference/main.py:360-364`):

    python -m llama3_quantization_tpu.tools.generate_act_stats \
        --model /ckpt/Meta-Llama-3-8B --calib_dataset wikitext2 \
        --out act_stats_llama3_8b.npz
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser("generate_act_stats")
    p.add_argument("--model", default=None)
    p.add_argument("--net", default=None)
    p.add_argument("--calib_dataset", default="wikitext2",
                   choices=["wikitext2", "ptb", "c4", "synthetic"])
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from ..cli import get_calib, load_model
    from ..quant.smoothquant import collect_act_stats, save_act_stats

    params, cfg = load_model(args)
    args.seqlen = min(args.seqlen, cfg.max_position_embeddings)
    tokenizer = None
    if args.model:
        from ..eval.data import HFTokenizer

        try:
            tokenizer = HFTokenizer(args.model)
        except Exception as e:
            print(f"tokenizer unavailable: {e}", file=sys.stderr)
    calib = get_calib(args, tokenizer, cfg.vocab_size)
    stats = collect_act_stats(params, cfg, calib)
    save_act_stats(stats, args.out)
    print(f"wrote {args.out} ({cfg.num_layers} layers)")


if __name__ == "__main__":
    main()
