"""Tracing / profiling: per-stage wall-clock and sites/sec counters.

The reference has no instrumentation beyond stderr prints (SURVEY §5.1).
Here every pipeline run can record stage timings (parse, dedup, fit,
classify, serialize) and derived throughput, printable as a stderr report or
machine-readable dict; ``SIDTPU_TRACE=<dir>`` additionally captures a JAX
profiler trace of the device work for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional


class StageProfile:
    """Accumulates named stage durations for one pipeline run."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: List[tuple] = []  # (name, seconds)
        self.counters: Dict[str, float] = {}
        self._trace_dir = os.environ.get("SIDTPU_TRACE")
        self._tracing = False

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.append((name, time.perf_counter() - t0))

    def count(self, name: str, value: float) -> None:
        if self.enabled:
            self.counters[name] = self.counters.get(name, 0.0) + value

    def start_device_trace(self) -> None:
        if self._trace_dir and not self._tracing:
            import jax

            jax.profiler.start_trace(self._trace_dir)
            self._tracing = True

    def stop_device_trace(self) -> None:
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False

    def total(self) -> float:
        return sum(s for _, s in self.stages)

    def as_dict(self) -> Dict[str, float]:
        d = {f"time_{name}_s": round(sec, 6) for name, sec in self.stages}
        d.update(self.counters)
        n = self.counters.get("sites")
        if n and self.total() > 0:
            d["sites_per_sec"] = round(n / self.total(), 1)
        return d

    def report(self, log=None) -> str:
        lines = []
        total = self.total()
        for name, sec in self.stages:
            pct = 100.0 * sec / total if total else 0.0
            lines.append(f"# stage {name}: {sec*1e3:.1f} ms ({pct:.0f}%)")
        n = self.counters.get("sites")
        if n and total > 0:
            lines.append(f"# throughput: {n/total:,.0f} sites/s over {int(n)} sites")
        text = "\n".join(lines)
        if log:
            for line in lines:
                log(line)
        return text


_active: Optional[StageProfile] = None


def current() -> Optional[StageProfile]:
    return _active


def activate(profile: Optional[StageProfile]) -> None:
    global _active
    _active = profile


@contextlib.contextmanager
def maybe_stage(name: str):
    """Record a stage on the active profile, if any (library-internal hook)."""
    p = _active
    if p is None:
        yield
    else:
        with p.stage(name):
            yield


@contextlib.contextmanager
def device_stage(name: str):
    """Record a device dispatch block: wall time under ``device:{name}`` plus
    a ``device_dispatches`` counter. Wrap the whole transfer+compute+fetch
    block so the stage captures what the accelerator actually costs the
    pipeline (h2d, dispatch, d2h), not just kernel time."""
    p = _active
    if p is None:
        yield
    else:
        p.count("device_dispatches", 1)
        with p.stage(f"device:{name}"):
            yield


def device_seconds(profile: "StageProfile") -> float:
    """Total wall seconds spent in device stages of one run."""
    return sum(sec for name, sec in profile.stages if name.startswith("device:"))
