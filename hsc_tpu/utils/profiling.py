"""Tracing / profiling helpers (SURVEY.md §5 "Tracing / profiling").

The reference has wall-clock timing at best; here: `jax.profiler` Perfetto
traces gated by a directory flag, plus named scopes so the correlate /
select / update stages are attributable in the trace viewer.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_region(profile_dir: str | None):
    """Collect a device trace into `profile_dir` (no-op when None)."""
    if profile_dir is None:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    """Named scope for trace attribution: ``with scope('mp/select'): ...``"""
    return jax.named_scope(name)
