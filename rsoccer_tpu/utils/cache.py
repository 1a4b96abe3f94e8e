"""Persistent XLA compilation cache setup.

On this class of deployment (remote-compile TPU tunnels) a cold compile of a
full training step costs minutes; the persistent cache makes every re-run of
an unchanged program near-instant.  ``bench.py`` has always enabled it — this
helper gives the example/training scripts the same behavior.

Call before building any jitted program (idempotent).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``path``.

    Resolution order: explicit arg > ``JAX_COMPILATION_CACHE_DIR`` env var >
    ``/tmp/jax_cache`` (shared with bench.py).  Returns the directory used.
    """
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
