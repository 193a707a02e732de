"""Persistent XLA compilation cache + serving warmup helpers.

Cold-start cost on one v5e chip is substantial (first decode-program compile
measured 40-220 s depending on compile-service load); the reference has no
equivalent problem (torch eager). Wiring ``jax_compilation_cache_dir`` makes
every (bucket, config) program compile once per MACHINE instead of once per
process: a cache-hit start was measured at ~1.2 s vs 156 s cold on the same
program.

``enable_persistent_cache`` is called from every serving entry point
(TTSPipeline, CLI, server, Gradio, trainer CLI). Disable by setting
``T5GEMMA_TTS_COMPILE_CACHE=off``.

Measured on the tunneled dev backend: the flagship decode program resolves
in ~9 s on a cache hit via AOT lower+compile (1.5 s trace + 7.1 s cached
fetch) vs 95+ s cold; the first *execution* still pays a backend
executable-load cost that is specific to the tunneled environment. On a
standard Cloud TPU runtime a hit skips the whole compile.
"""

from __future__ import annotations

import os
from typing import Optional

_ENV = "T5GEMMA_TTS_COMPILE_CACHE"
_enabled_dir: Optional[str] = None


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX at an on-disk compilation cache (idempotent).

    Resolution order: explicit arg > $T5GEMMA_TTS_COMPILE_CACHE >
    ~/.cache/t5gemma_tts_tpu/xla. Returns the directory in use, or None if
    disabled ("off"/"0"/"") or if configuration failed (e.g. the backend was
    already initialized with a different cache).
    """
    global _enabled_dir
    env = os.environ.get(_ENV)
    if cache_dir is None:
        cache_dir = env
    if cache_dir is not None and str(cache_dir).lower() in ("off", "0", ""):
        return None
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "t5gemma_tts_tpu", "xla")
    if _enabled_dir is not None:
        return _enabled_dir
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist anything that took real compile time; tiny programs are
        # cheaper to recompile than to round-trip through disk
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled_dir = cache_dir
    except Exception:
        return None
    return _enabled_dir
