"""Process-level runtime setup: persistent compilation cache, misc knobs.

XLA compiles are expensive (especially on small hosts); enabling JAX's
persistent compilation cache makes repeated driver invocations (collect →
train → eval pipelines) start in seconds instead of minutes. Drivers call
``setup()`` first thing; the cache dir can be overridden with
``JAX_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os
from pathlib import Path


def setup(cache_dir: str | None = None) -> None:
    """Opt-in only: enabling the cache unconditionally deadlocked compiles on
    the jax 0.9 + axon-plugin build in this image (verified empirically — a
    ConditionalUnet1D init hangs with jax_compilation_cache_dir set). Export
    JAX_COMPILATION_CACHE_DIR explicitly to turn it on."""
    import jax

    # Honor JAX_PLATFORMS even when a sitecustomize (e.g. the axon TPU-tunnel
    # shim in this image) force-registers another platform and overrides the
    # env var via jax config. Without this, `JAX_PLATFORMS=cpu` driver runs
    # still grab the TPU and serialize against every other process.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    cache = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache:
        return
    Path(cache).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags
