"""Runtime utilities: persistent compilation cache, stage timers,
profiling hooks, NaN canaries.

The reference has no tracing/profiling at all (SURVEY §5) — console
counters only.  Here: wall-clock stage timers (the counters the pipeline
logs are the de-facto regression oracle), an opt-in ``jax.profiler`` trace
context, a persistent XLA compilation cache (bucketed static shapes make
recompiles the dominant cost of short runs), and a debug-NaN switch that
plays the role of the reference's EIGEN_INITIALIZE_MATRICES_BY_NAN canary
(CMakeLists.txt:59-60).
"""

from __future__ import annotations

import contextlib
import os
import time


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes."""
    import jax

    path = path or os.environ.get(
        "PBA_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/pba_tpu_xla")
    )
    # separate per backend: entries are keyed by platform, but mixing hosts
    # with different CPU feature sets in one directory triggers SIGILL
    # warnings when another process wrote incompatible CPU executables
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def enable_nan_canary() -> None:
    """Raise on NaNs flowing out of jitted computations (debug builds)."""
    import jax

    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is None."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating named wall-clock timers."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        return ", ".join(
            f"{k}={self.totals[k]:.2f}s/{self.counts[k]}x"
            for k in sorted(self.totals)
        )
