"""Tracing/profiling (SURVEY.md §5).

The reference's only observability is manual time.time() prints
(code/union_clip_llava2.py:163-168). Here:
  - `trace(...)`: context manager wrapping jax.profiler.TraceAnnotation for
    named device-timeline regions;
  - `profile_to(dir)`: captures a TensorBoard-loadable device trace;
  - `annotate_fn`: decorator version for pipeline stages.
StageStats (utils/stats.py) remains the lightweight wall-clock layer.
"""

from __future__ import annotations

import contextlib
from functools import wraps
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate_fn(name: Optional[str] = None):
    def deco(fn):
        label = name or fn.__qualname__

        @wraps(fn)
        def wrapper(*a, **kw):
            with trace(label):
                return fn(*a, **kw)

        return wrapper

    return deco
