"""Tracing and step timing.

The reference's only instrumentation was wall-clock time.time() around the
train loop (train.py:84,122-124; SURVEY.md §5).  Here:

  * fetch(x)   — a TRUE device barrier.  On this environment's tunneled TPU
                 platform, jax.block_until_ready returns before execution
                 completes (measured; see BASELINE_MEASURED.json note), so
                 every timing utility here synchronizes by copying one
                 element to the host instead.
  * timed(fn)  — (result, seconds) with the barrier applied.
  * StepTimer  — running steps/sec + particle-steps/sec over a train loop.
  * trace(dir) — jax.profiler trace context for XLA/TPU timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional, Tuple

import jax
import numpy as np


def fetch(x: Any) -> Any:
    """Force completion of `x`'s computation via a host copy of ONE ELEMENT.

    One element, not one leaf: device->host transfers ride the same slow
    tunnel as everything else here (~30 MB/s measured), so fetching a whole
    result array would time the copy, not the compute.  TPU programs run in
    order on the stream, so the element slice (a separate tiny program)
    completes only after the producing program has."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        leaf = leaves[0]
        elem = leaf.ravel()[:1] if getattr(leaf, "ndim", 0) else leaf
        np.asarray(jax.device_get(elem))
    return x


def timed(fn: Callable, *args, **kwargs) -> Tuple[Any, float]:
    """Run fn and return (result, wall seconds) with a true barrier."""
    t0 = time.perf_counter()
    out = fetch(fn(*args, **kwargs))
    return out, time.perf_counter() - t0


class StepTimer:
    """Throughput tracker for a train loop.

    Usage:
        timer = StepTimer(particles_per_step=b * n)
        for ...:
            state, loss = step(...)
            timer.tick(loss)          # barrier + record
        print(timer.summary())
    """

    def __init__(self, particles_per_step: Optional[int] = None):
        self.particles_per_step = particles_per_step
        self.times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self, barrier_value: Any = None):
        if barrier_value is not None:
            fetch(barrier_value)
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def median_step_s(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.median_step_s

    @property
    def particle_steps_per_sec(self) -> float:
        if self.particles_per_step is None:
            raise ValueError("particles_per_step not set")
        return self.particles_per_step * self.steps_per_sec

    def summary(self) -> dict:
        out = {"steps": len(self.times), "median_step_s": self.median_step_s,
               "steps_per_sec": self.steps_per_sec}
        if self.particles_per_step is not None:
            out["particle_steps_per_sec"] = self.particle_steps_per_sec
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
