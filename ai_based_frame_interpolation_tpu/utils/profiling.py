"""Profiling hooks: jax.profiler traces around train/infer steps.

TPU-native replacement for the reference's observability gap (tqdm bars only,
SURVEY.md §5 tracing/profiling): wrap any hot region in ``trace`` to collect
a TensorBoard-viewable profile, or use ``annotate`` for named sub-regions
that show up on the TraceViewer timeline.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Collect a jax.profiler trace into ``log_dir`` (no-op when None and
    FI_TPU_PROFILE_DIR unset)."""
    log_dir = log_dir or os.environ.get("FI_TPU_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
