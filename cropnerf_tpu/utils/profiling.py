"""Profiling and step-timing instrumentation.

TPU equivalent of the reference's profiling hooks (SURVEY §5.1: nerfstudio
``@profiler.time_function`` events + rich progress + ad-hoc ``time.time``
prints): ``jax.profiler`` trace capture for device timelines plus a
lightweight host-side step timer with rays/s and EMA step time.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Optional


@contextlib.contextmanager
def device_trace(logdir: Path):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    import jax
    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rays/s + EMA step-time counters (≙ the reference's
    num_rays_per_sec/fps metrics, fruit_pipeline.py:216-220)."""

    def __init__(self, rays_per_step: int, ema: float = 0.9):
        self.rays_per_step = rays_per_step
        self.ema = ema
        self._last: Optional[float] = None
        self.step_time_ema: Optional[float] = None
        self.total_steps = 0
        self.total_time = 0.0

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        out: Dict[str, float] = {}
        if self._last is not None:
            dt = now - self._last
            self.total_time += dt
            self.total_steps += 1
            self.step_time_ema = (dt if self.step_time_ema is None else
                                  self.ema * self.step_time_ema
                                  + (1 - self.ema) * dt)
            out = {
                "step_time_ms": self.step_time_ema * 1e3,
                "rays_per_s": self.rays_per_step / max(self.step_time_ema,
                                                       1e-9),
            }
        self._last = now
        return out

    @property
    def mean_rays_per_s(self) -> float:
        if self.total_time == 0:
            return 0.0
        return self.total_steps * self.rays_per_step / self.total_time
