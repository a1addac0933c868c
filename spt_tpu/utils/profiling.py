"""Profiling and render statistics.

The reference's only observability is an ImGui FPS readout (App.cpp:292)
and an aspirational RAII ProfilerBlock design
(architecture-redesign-gameplan.md:1144-1178, MetricsCollector :1424-1468).
TPU-native equivalents: ``jax.profiler`` trace capture for XProf/Perfetto,
named trace annotations around wavefront stages, and a RenderStats
aggregator (rays/s, paths/s, sliding-window frame times).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


@contextlib.contextmanager
def trace_scope(name: str):
    """Named annotation visible in jax.profiler traces (XProf/Perfetto)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a device trace to ``log_dir`` for xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-time block timer with device sync."""

    def __init__(self, sync=None):
        self._sync = sync
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            jax.block_until_ready(self._sync)
        self.elapsed = time.perf_counter() - self._t0
        return False


class RenderStats:
    """Sliding-window render statistics (the MetricsCollector analog)."""

    def __init__(self, window: int = 64):
        self._frames = deque(maxlen=window)
        self.total_paths = 0
        self.total_rays = 0
        self.total_time = 0.0

    def record(self, seconds: float, n_paths: int,
               n_rays: Optional[int] = None) -> None:
        self._frames.append((seconds, n_paths, n_rays or 0))
        self.total_time += seconds
        self.total_paths += n_paths
        self.total_rays += n_rays or 0

    @property
    def fps(self) -> float:
        if not self._frames:
            return 0.0
        t = sum(f[0] for f in self._frames)
        return len(self._frames) / t if t > 0 else 0.0

    @property
    def paths_per_second(self) -> float:
        t = sum(f[0] for f in self._frames)
        return sum(f[1] for f in self._frames) / t if t > 0 else 0.0

    @property
    def rays_per_second(self) -> float:
        t = sum(f[0] for f in self._frames)
        return sum(f[2] for f in self._frames) / t if t > 0 else 0.0

    def summary(self) -> dict:
        return {"fps": self.fps, "paths_per_s": self.paths_per_second,
                "rays_per_s": self.rays_per_second,
                "total_paths": self.total_paths,
                "total_time_s": self.total_time}
