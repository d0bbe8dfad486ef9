"""Persistent XLA compilation cache helper.

On the tunneled TPU backend every new program shape pays a 30-60 s (or
worse) remote compile; the persistent cache turns repeat compiles across
processes into sub-second hits (measured: minutes -> 0.5 s). Enabled by
the benchmarking tools and by ``run_exp.py --compile_cache``.
"""
from __future__ import annotations

import os
import tempfile

__all__ = ["enable_compile_cache", "resolve_cache_arg"]

_TRUEY = ("true", "1", "yes", "on")
_FALSY = ("false", "0", "no", "off", "none", "")


def resolve_cache_arg(value):
    """Map a ``--compile_cache`` CLI value to an ``enable_compile_cache``
    argument: every other flag in the reference schema is a true/false
    string, so users inevitably type ``--compile_cache true`` — which,
    taken literally as a path, silently creates a cache directory named
    ``true/``. Boolean-ish strings mean "default directory" (returns
    None) or "disabled" (returns False); anything else is a real path."""
    if value is None or value is False:
        return False
    if isinstance(value, str):
        if value.lower() in _FALSY:
            return False
        if value.lower() in _TRUEY:
            return None
    if value is True:
        return None
    return value


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
