"""Persistent XLA compilation cache.

TPU compiles of the fused signal programs are expensive (minutes through a
remote-compile tunnel); the persistent cache makes every subsequent process
start near-instant. Safe to call multiple times; honours
MISINFO_TPU_CACHE_DIR (default: <repo>/.jax_cache, falling back to a
tmpdir when the repo is read-only).
"""

from __future__ import annotations

import os
import tempfile


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    import jax

    cache_dir = cache_dir or os.environ.get("MISINFO_TPU_CACHE_DIR")
    if cache_dir is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(repo, ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        cache_dir = os.path.join(tempfile.gettempdir(), "misinfo_jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
