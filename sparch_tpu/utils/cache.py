"""Persistent XLA compilation cache helper.

On the tunneled TPU backend every new program shape pays a 30-60 s (or
worse) remote compile; the persistent cache turns repeat compiles across
processes into sub-second hits (measured: minutes -> 0.5 s). Enabled by
the benchmarking tools and by ``run_exp.py --compile_cache``.
"""
from __future__ import annotations

import os
import tempfile

__all__ = ["enable_compile_cache"]


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default:
    a stable per-user tmp directory). Safe to call multiple times."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(tempfile.gettempdir(), "sparch_tpu_xla_cache"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
