"""Persistent XLA compilation cache.

The tunneled TPU's remote compile service can be slow (minutes per
program under load), so every entry point enables JAX's persistent
compilation cache: compiled executables are serialized under
.jax_cache/ and later processes (including the benchmark driver) load
them in seconds.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    # TPU-only: XLA:CPU cache entries are AOT blobs whose recorded
    # machine features can mismatch the loading host (observed SIGILL
    # crashes in compilation_cache.get_executable_and_time on
    # CPU-backend runs), and CPU compiles are fast anyway.
    try:  # non-initializing check: configured platform list or env pin
        platform = (getattr(jax.config, "jax_platforms", None)
                    or os.environ.get("JAX_PLATFORMS", ""))
    except Exception:
        platform = ""
    if "cpu" in str(platform):
        return None
    if not str(platform):
        # Nothing pinned: a host with no accelerator silently falls
        # back to XLA:CPU, where cached AOT blobs can SIGILL on a
        # different-CPU loader.  Resolve the actual backend (this
        # initializes JAX, acceptable at entry points) and skip the
        # cache unless a real accelerator is present.
        try:
            if jax.default_backend() == "cpu":
                return None
        except Exception:
            return None
    cache_dir = cache_dir or os.environ.get(
        "ILSWISS_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
