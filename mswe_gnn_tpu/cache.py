"""Persistent XLA compilation cache setup.

First compiles through the remote-compile tunnel cost minutes; enabling the
on-disk cache makes every subsequent process reuse them. Call
:func:`enable_compilation_cache` once at program start (main.py and bench.py
do). Safe to call when the backend does not support caching.
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    if platform == "cpu":
        # XLA:CPU AOT results bake in host CPU features (-march=native
        # equivalents); a cache written on one machine spams feature-mismatch
        # errors (and risks SIGILL) on another. CPU compiles are fast —
        # the persistent cache only pays for itself on the TPU tunnel.
        return
    cache_dir = cache_dir or os.environ.get(
        "MSWE_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
