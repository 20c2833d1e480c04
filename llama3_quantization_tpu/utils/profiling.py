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
