"""Runtime knobs: persistent XLA compilation cache.

The SAMS production graphs take minutes to compile through the TPU tunnel;
caching compiled executables on disk makes every subsequent run (training
restarts, bench, tests) start in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "SHINEON_COMPILE_CACHE", os.path.expanduser("~/.cache/shineon_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knob
        pass
