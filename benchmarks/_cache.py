"""Persistent XLA compilation cache for benchmark entry points.

The remote-dispatch (tunnel) backend's compiles cost seconds to minutes
each when the link is congested; the persistent cache makes every re-run
of a benchmark reuse the serialized executables (same mechanism
``tests/conftest.py`` uses for the CPU suite).  Call :func:`enable` BEFORE
the first jax dispatch.
"""

from __future__ import annotations

import os


def enable() -> None:
    import jax

    cache_dir = os.environ.get(
        "MGTPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax or read-only fs: benchmarks still run, uncached
