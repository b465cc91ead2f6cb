"""Profiling & tracing utilities (SURVEY.md §5: the reference has none; the
rebuild makes jax.profiler traces and per-step timing first-class).

Usage:
    from mslesions3d_tpu.utils.profiling import time_fn, trace
    ms = time_fn(jitted, args)                 # steady-state ms/call
    with trace("/tmp/tb"):                     # XLA trace for tensorboard
        jitted(*args)
"""

from __future__ import annotations

import contextlib
import time

import jax


def block(tree):
    """Block on every array leaf of a pytree."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


def time_fn(fn, args=(), kwargs=None, iters: int = 20, warmup: int = 3) -> float:
    """Steady-state wall-clock ms per call (compiles + warms first)."""
    kwargs = kwargs or {}
    block(fn(*args, **kwargs))  # compile
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    block(out)
    return (time.perf_counter() - t0) / iters * 1e3


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight per-step timing for training loops.

    Records wall seconds between successive .tick() calls; .summary() gives
    mean/p50/max over the recorded window.
    """

    def __init__(self, window: int = 200):
        self.window = window
        self.times: list[float] = []
        self._last: float | None = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            "step_time_mean_s": sum(ts) / len(ts),
            "step_time_p50_s": ts[len(ts) // 2],
            "step_time_max_s": ts[-1],
        }
