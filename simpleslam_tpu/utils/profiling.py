"""Tracing / profiling: per-stage timing counters + jax profiler hooks.

The reference has no profiling beyond tqdm (SURVEY.md §5); the TPU build
needs per-stage FPS accounting for the >= 60 FPS north star and jax traces
for kernel work.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named pipeline stage.

    Use ``with timer.stage("extract"): ...`` around host-visible work (call
    ``jax.block_until_ready`` inside when timing device work).
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def fps(self, name: str) -> float:
        t = self.totals.get(name, 0.0)
        return self.counts.get(name, 0) / t if t > 0 else 0.0

    def report(self) -> str:
        rows = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t = self.totals[name]
            n = self.counts[name]
            rows.append(f"{name:<22s} {t:8.3f}s  {n:5d} calls "
                        f"{1e3 * t / max(n, 1):8.2f} ms/call "
                        f"{self.fps(name):8.2f} /s")
        return "\n".join(rows)


@contextlib.contextmanager
def jax_trace(log_dir: Optional[str]):
    """Capture a jax profiler trace (open with xprof/tensorboard) when a
    directory is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
