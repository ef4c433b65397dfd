"""Tracing/profiling and failure-detection helpers (SURVEY.md §5).

The reference's observability is TickTock wall-clock prints
(test_optical_flow.cpp:69-73,172-179); here the equivalents are
device-aware: ``trace()`` wraps ``jax.profiler`` for XLA-level traces,
``StageTimer`` aggregates per-stage wall times with correct device
synchronization, and ``assert_finite`` is the NaN/Inf guard the
reference's per-feature kNumericError check plays at tracker level.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate per-stage wall time; ``stage()`` synchronizes the
    device on exit so async dispatch doesn't misattribute time."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict:
        return {name: {"total_ms": 1e3 * tot,
                       "mean_ms": 1e3 * tot / self.counts[name],
                       "count": self.counts[name]}
                for name, tot in self.totals.items()}


def assert_finite(tree, name: str = "value"):
    """Raise if any array leaf contains NaN/Inf (host-side check; for
    in-jit guards use jax.debug or the trackers' status machinery)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            if not bool(jnp.isfinite(arr).all()):
                raise FloatingPointError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}")
    return tree
