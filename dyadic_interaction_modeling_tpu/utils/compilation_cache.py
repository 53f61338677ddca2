"""Persistent XLA compilation cache.

Compiles on the axon TPU platform are expensive (tens to hundreds of seconds
for the full-dims models); the persistent cache makes every entry point after
the first run start in seconds. Enabled by all CLIs, bench.py and
__graft_entry__.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "DIM_TPU_JAX_CACHE", os.path.expanduser("~/.cache/dim_tpu_jax"))


def enable_persistent_cache(path: str = DEFAULT_CACHE_DIR) -> None:
    """TPU-only: XLA:CPU AOT cache entries written by a process with the axon
    plugin loaded carry different host-feature tuning flags and MISCOMPILE
    when loaded by a plain-CPU process (observed as NaNs). The TPU executable
    cache has no such issue and is where the compile time actually hurts.
    """
    import jax

    try:
        if jax.default_backend() != "tpu":
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
