"""Per-op device-time report from a jax.profiler trace.

The reference's only observability is wall-clock ticks (`main.py:369,397`)
and per-token medians (`llama.py:409-464`); SURVEY.md §5 calls for
per-kernel HBM accounting on TPU. Usage:

    L3Q_BENCH_TRACE=/tmp/trace python bench.py        # capture
    python -m llama3_quantization_tpu.tools.profile_report /tmp/trace \
        --steps 256 --top 25

prints the device-op table (total/per-step time, counts, share) that
identifies what the step spends its HBM bytes on — e.g. the analysis in
docs/BENCH_NOTES.md pinning 9.90 ms/step to the layer loop and 1.15 ms to
the lm_head matvec came from exactly this table.
"""

from __future__ import annotations

import argparse

from ..utils.profiling import device_op_table, format_op_table, load_trace_events


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("trace", help="jax.profiler log dir or *.trace.json.gz path")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--steps", type=int, default=1,
                   help="divide totals by this for per-step numbers")
    args = p.parse_args(argv)
    events = load_trace_events(args.trace)
    rows = device_op_table(events, top=args.top, steps=args.steps)
    print(format_op_table(rows))


if __name__ == "__main__":
    main()
