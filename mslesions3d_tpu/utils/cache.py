"""Persistent XLA compilation cache (first compiles through the axon
remote-compile tunnel take minutes; repeat CLI invocations should be warm)."""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None):
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "MSL_JAX_CACHE",
            str(Path(__file__).resolve().parents[2] / ".jax_cache"),
        )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
