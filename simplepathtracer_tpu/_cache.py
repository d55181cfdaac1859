"""Persistent XLA compilation cache setup.

Through the remote-compile tunnel a fresh program costs 30-600 s to
compile; the on-disk cache makes every repeat process start warm.  Called
by bench/experiment entry points (NOT on library import — tests and users
may want a pristine config).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("SPT_JAX_CACHE", "/tmp/spt_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
