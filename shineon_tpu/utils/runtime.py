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


def donating_jit(fn):
    """jit with the leading (state) argument donated on TPU backends.

    Donation halves peak optimizer-state HBM in the train step. On XLA:CPU
    it is disabled: buffers can remain referenced by eager arrays (tests,
    notebooks) and donating them there hard-aborts the process.
    """
    import jax

    if jax.default_backend() == "tpu":
        return jax.jit(fn, donate_argnums=(0,))
    return jax.jit(fn)
