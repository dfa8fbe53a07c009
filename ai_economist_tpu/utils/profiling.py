"""Profiling / tracing hooks.

The reference has no built-in profiling (its notebooks time CPU-vs-GPU steps
ad hoc; SURVEY.md §5). Here profiling is first-class: a jax.profiler trace
context for TensorBoard-viewable device traces, and a step timer that reports
per-phase env-step throughput in the benchmark's units (env-steps/s/chip).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace (XLA ops, fusion, HBM traffic) for TensorBoard:
    `with trace("/tmp/jax-trace"): run_steps()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock phase timer with env-steps/s reporting.

    timer = StepTimer(num_envs=4096)
    with timer.phase("rollout"):   # may be entered repeatedly
        ...
    timer.report()
    """

    def __init__(self, num_envs: int = 1):
        self.num_envs = int(num_envs)
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, steps: int = 1, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + steps

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, total in self.totals.items():
            n = self.counts[name]
            out[name] = {
                "total_s": total,
                "steps": n,
                "s_per_step": total / max(n, 1),
                "env_steps_per_s": self.num_envs * n / total if total > 0 else 0.0,
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.stats().items()):
            lines.append(
                f"{name}: {s['total_s']:.3f}s / {s['steps']} steps "
                f"= {s['env_steps_per_s']:.1f} env-steps/s"
            )
        text = "\n".join(lines)
        print(text)
        return text
