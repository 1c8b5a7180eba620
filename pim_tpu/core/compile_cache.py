"""Persistent XLA compilation cache for the heavy jitted programs.

The full frame step at 512² carries dozens of Pallas kernels; through the
remote-TPU tunnel a cold compile is minutes (measured 2-30 min under
server load, r4).  The JAX persistent cache keys serialized executables
by program hash, so re-running bench/profile/app after a restart skips
straight to execution.  Analog of the reference's pipeline/renderpass
caches (src/rendering/vulkan/vkr_pipeline.c).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "pim_tpu_xla")


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently enable the persistent compile cache; returns its dir.
    PIM_XLA_CACHE overrides the location; PIM_XLA_CACHE=0 disables."""
    env = os.environ.get("PIM_XLA_CACHE", "")
    if env == "0":
        return ""
    cache_dir = path or env or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache anything that took real compile time; tiny programs recompile
    # faster than they deserialize
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    return cache_dir
