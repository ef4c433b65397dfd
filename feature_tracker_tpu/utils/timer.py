"""Wall-clock timers.

``TickTock`` mirrors the reference's timer semantics
(reference: test_optical_flow.cpp:69-73 — construct, work,
``TockTickInMillisecond`` returns elapsed ms and restarts the clock).
``time_jitted`` adds the JAX-specific discipline: synchronize with
``block_until_ready`` and separate compile time from steady-state time.
"""

from __future__ import annotations

import time

import jax


class TickTock:
    """Millisecond stopwatch; construction starts the clock."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def tick(self) -> None:
        self._t0 = time.perf_counter()

    def tock_ms(self) -> float:
        """Elapsed milliseconds since the last tick (clock keeps running)."""
        return (time.perf_counter() - self._t0) * 1e3

    def tock_tick_ms(self) -> float:
        """Elapsed milliseconds since the last tick, then restart."""
        now = time.perf_counter()
        ms = (now - self._t0) * 1e3
        self._t0 = now
        return ms


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return out


def time_jitted(fn, *args, iters: int = 10, warmup: int = 1):
    """Time a jitted callable correctly on an async backend.

    Returns (last_output, stats) where stats has ``compile_ms`` (first,
    warmup call — includes tracing+compilation) and ``mean_ms`` over
    ``iters`` synchronized steady-state calls.
    """
    t = TickTock()
    out = None
    for _ in range(max(warmup, 1)):
        out = _sync(fn(*args))
    compile_ms = t.tock_tick_ms() / max(warmup, 1)

    t.tick()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    mean_ms = t.tock_ms() / iters
    return out, {"compile_ms": compile_ms, "mean_ms": mean_ms}
