"""Profiling helpers: jax.profiler traces + throughput accounting.

The reference has only wall-clock ticks (`main.py:369,397`,
`llama.py:409-464`; SURVEY.md §5 tracing). Here:
- `profile_trace(dir)` context manager wraps a region in a jax.profiler
  trace (open with xprof/tensorboard to see per-kernel HBM utilization);
- `Throughput` accumulates tokens + wall time and reports tok/s alongside a
  bytes-per-token roofline fraction for speed-of-light tracking.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Throughput:
    """Tokens/sec + roofline accounting for a decode/eval loop."""

    bytes_per_token: Optional[float] = None  # model HBM bytes per token
    hbm_gbps: float = 819.0  # v5e
    tokens: int = 0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, tokens: int):
        self.seconds += time.perf_counter() - self._t0
        self.tokens += tokens

    @property
    def tok_s(self) -> float:
        return self.tokens / self.seconds if self.seconds else 0.0

    @property
    def speed_of_light_fraction(self) -> Optional[float]:
        if not self.bytes_per_token:
            return None
        sol = self.hbm_gbps * 1e9 / self.bytes_per_token
        return self.tok_s / sol

    def report(self) -> dict:
        out = {"tokens": self.tokens, "seconds": round(self.seconds, 4),
               "tok_s": round(self.tok_s, 2)}
        frac = self.speed_of_light_fraction
        if frac is not None:
            out["speed_of_light_fraction"] = round(frac, 4)
        return out


# ---------------------------------------------------------------------------
# Trace report: per-op device-time table from a jax.profiler trace
# ---------------------------------------------------------------------------


def load_trace_events(trace_dir: str):
    """Find the newest `*.trace.json.gz` under a jax.profiler log dir (or
    accept a direct path to one) and return its traceEvents list."""
    import gzip
    import json
    import os

    path = trace_dir
    if not path.endswith(".json.gz"):
        cands = []
        for root, _dirs, files in os.walk(trace_dir):
            cands += [os.path.join(root, f) for f in files if f.endswith(".trace.json.gz")]
        if not cands:
            raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
        path = max(cands, key=os.path.getmtime)
    with gzip.open(path) as f:
        return json.load(f).get("traceEvents", [])


def device_op_table(events, top: int = 25, steps: int = 1):
    """Aggregate device-side complete events by op name.

    Returns rows of (name, count, total_ms, mean_us, share) sorted by
    total time; `steps` divides totals for per-step numbers. Device pids
    are identified by their process_name metadata ('/device:...'), so host
    python frames don't pollute the table."""
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and str(e.get("args", {}).get("name", "")).startswith("/device")
    }
    agg: dict = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e.get("name", "?")
            tot, cnt = agg.get(name, (0.0, 0))
            agg[name] = (tot + e["dur"], cnt + 1)
    total = sum(t for t, _ in agg.values()) or 1.0
    rows = [
        (name, cnt, tot / 1e3, tot / max(cnt, 1), tot / total)
        for name, (tot, cnt) in agg.items()
    ]
    rows.sort(key=lambda r: -r[2])
    return [
        {
            "name": name,
            "count": cnt,
            "total_ms": round(total_ms, 3),
            "per_step_us": round(total_ms * 1e3 / steps, 1),
            "mean_us": round(mean_us, 1),
            "share": round(share, 4),
        }
        for name, cnt, total_ms, mean_us, share in rows[:top]
    ]


def format_op_table(rows) -> str:
    out = [f"{'total ms':>10} {'per-step us':>12} {'count':>7} {'share':>6}  op"]
    for r in rows:
        out.append(
            f"{r['total_ms']:10.2f} {r['per_step_us']:12.1f} {r['count']:7d} "
            f"{r['share']:6.1%}  {r['name'][:90]}"
        )
    return "\n".join(out)
