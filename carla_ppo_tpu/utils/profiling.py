"""Profiling / tracing helpers.

The reference's only perf observability is an FPS counter on the HUD
(reference: hud.py:74-75) and an average-fps EMA for video timing
(carla_lap_env.py:324-326). Here: jax.profiler trace capture (viewable in
TensorBoard or Perfetto), phase timers, and steps/sec counters.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


def sync_fetch(out) -> None:
    """Force completion of `out` with a minimal device->host readback.

    On the axon remote TPU platform `jax.block_until_ready` can return
    WITHOUT waiting (measured round 3: 0.016 ms for a chained 2048^2-matmul
    program whose real device time is milliseconds), so the only reliable
    completion barrier is an actual host fetch. Device execution is serial
    per chip, so transferring one leaf of the last enqueued program fences
    everything enqueued before it; this fetches the SMALLEST array leaf to
    keep the transfer cheap. Large buffers still cost real transfer time
    (a [1024, 80, 160] frame batch ~22 ms - bench.py module docstring):
    reduce to a scalar on-device before timing where possible.
    """
    import numpy as np

    leaves = [
        l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "size")
    ]
    if leaves:
        np.asarray(min(leaves, key=lambda l: l.size))


def timeit_device(fn, *args, iters: int = 10) -> float:
    """Mean seconds/call over `iters` enqueued calls of `fn(*args)`,
    synchronized ONCE at the end via `sync_fetch` (the bench.py
    methodology). The first call - compile + warmup - is excluded. Do NOT
    time with `jax.block_until_ready` on the axon platform: it does not
    block (see `sync_fetch`).

    Requirement: `fn` must be a SINGLE jitted program (one dispatch per
    call) whose outputs all come from that program - sync_fetch fences via
    one leaf of the last enqueued program, which only fences *earlier*
    dispatches of the chain because the per-chip execution queue is serial.
    A fn that issues several programs internally and returns a leaf of an
    earlier one would let the final program escape the fence; a fn
    returning no array leaves syncs nothing. Every benchmarks/ call site
    passes one jitted fn that reduces to a small (ideally scalar) output."""
    out = fn(*args)
    sync_fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync_fetch(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile (xplane) for the enclosed block.

    View with: tensorboard --logdir <log_dir>  (Profile tab), or convert to
    Perfetto. Usage:
        with device_trace("models/m/profile"):
            train_iteration(...)  # block_until_ready inside
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase accounting with steps/sec rates.

    timer.phase("rollout") context-manages a named phase; `rates(n)` reports
    n/second per phase plus totals.
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self, units_per_call: Optional[Dict[str, float]] = None) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            line = f"{name}: {total:.3f}s over {n} calls ({total / n * 1e3:.1f} ms/call)"
            if units_per_call and name in units_per_call:
                rate = units_per_call[name] * n / total
                line += f", {rate:,.0f} units/s"
            lines.append(line)
        return "\n".join(lines)


class ThroughputMeter:
    """EMA steps/sec counter (the `average_fps` analog,
    carla_lap_env.py:324-326, generalized)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.rate: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self, units: float) -> float:
        now = time.perf_counter()
        if self._last is not None:
            inst = units / max(now - self._last, 1e-9)
            self.rate = (
                inst
                if self.rate is None
                else (1 - self.alpha) * self.rate + self.alpha * inst
            )
        self._last = now
        return self.rate or 0.0
