"""Persistent XLA compilation cache setup that survives jax preloading.

Setting ``JAX_COMPILATION_CACHE_DIR`` in ``os.environ`` is not enough in
environments whose ``sitecustomize`` imports jax before user code runs
(the config value latches at jax import, so a later ``environ`` write is
silently ignored and every process pays full first-compile cost — on a
remote-attached chip that is minutes per executable). This helper sets
the cache directory through ``jax.config`` as well, which works whenever
it runs.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/hpe_jax_cache")


def ensure_compilation_cache(path: str | None = None) -> str:
    """Enable the persistent compile cache; returns the directory used.

    Precedence: explicit ``path`` arg > ``JAX_COMPILATION_CACHE_DIR`` env
    var > a directory already configured on ``jax.config`` > the default.
    Never overrides a directory the user configured via ``jax.config``.
    """
    import jax

    configured = jax.config.jax_compilation_cache_dir
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or configured
    path = path or DEFAULT_CACHE_DIR
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    if configured != path:
        jax.config.update("jax_compilation_cache_dir", path)
    return path
