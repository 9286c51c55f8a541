"""Persistent XLA compilation cache.

Verified to work through the axon TPU relay (remote compiles are 40s-7min;
cached reloads are ~1s). Enabled by bench.py and the CLIs; set
F5_TTS_COMPILE_CACHE=0 to disable or F5_TTS_COMPILE_CACHE_DIR to relocate.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/korean_f5_tts_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("F5_TTS_COMPILE_CACHE", "1") == "0":
        return
    import jax

    cache_dir = cache_dir or os.environ.get("F5_TTS_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    # scope per platform: CPU AOT entries loaded by a different-featured
    # host (e.g. relay compile helper vs local core) spam SIGILL warnings.
    # Read the configured platform string — default_backend() would
    # initialize the backend and lock the platform prematurely.
    platform = getattr(jax.config, "jax_platforms", None) or os.environ.get(
        "JAX_PLATFORMS") or "default"
    cache_dir = os.path.join(cache_dir, platform.split(",")[0])
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or already-initialized backend: best-effort
