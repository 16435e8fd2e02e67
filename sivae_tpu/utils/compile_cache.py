"""Persistent XLA compilation cache setup.

Flagship-model compiles take minutes (the two-phase step is a large fused
program); a persistent cache makes benchmark/CLI restarts start in seconds.
Call before the first jit execution.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags — cache is best-effort
