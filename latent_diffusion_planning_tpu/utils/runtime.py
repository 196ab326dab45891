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
    """Opt-in only. On the jax 0.9 + axon-tunnel build in this image the
    persistent cache is ineffective-to-harmful: round 1 saw a
    ConditionalUnet1D init hang with jax_compilation_cache_dir set; round 2
    saw entries written but warm runs no faster (the tunnel's remote-compile
    service bypasses local cache reuse). Export JAX_COMPILATION_CACHE_DIR
    explicitly to turn it on (it works as expected on directly-attached
    TPUs)."""
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
