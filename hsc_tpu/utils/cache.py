"""Persistent XLA compilation cache helper.

Remote TPU compilation in this environment costs minutes per program; the
persistent cache makes every subsequent process reuse compiled executables.
Call early (before the first jit execution).
"""

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    path = os.path.abspath(path or DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
