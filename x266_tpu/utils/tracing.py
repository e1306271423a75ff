"""Tracing / profiling hooks (SURVEY.md §5).

Two layers:
- device traces: `trace(dir)` wraps jax.profiler.trace so a whole encode
  runs under an xprof/perfetto capture; codec stages carry
  jax.named_scope annotations (see stage()) so traces read as
  mode-decision / recon / filters rather than op soup;
- host stage timers: lightweight wall-clock accounting per pipeline
  stage, reported as a dict (works on any backend, no tooling needed).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile of the enclosed block."""
    with jax.profiler.trace(log_dir):
        yield


def stage(name: str):
    """Annotate a codec stage inside jit (shows up in device traces)."""
    return jax.named_scope(name)


class StageTimers:
    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        return {k: {"seconds": round(v, 4), "calls": self.counts[k]}
                for k, v in sorted(self.totals.items(),
                                   key=lambda kv: -kv[1])}
