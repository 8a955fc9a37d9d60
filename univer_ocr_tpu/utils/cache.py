"""Persistent XLA compilation cache.

This environment compiles TPU programs through a remote-compile link where
a fresh program costs minutes; the on-disk cache makes every subsequent
process reuse compiled binaries.  Called by the train/predict/bench
entries before any jit executes.
"""

from pathlib import Path

import jax

DEFAULT_CACHE_DIR = Path(__file__).resolve().parents[2] / '.jax_cache'


def enable_persistent_cache(cache_dir=None):
    cache_dir = Path(cache_dir) if cache_dir else DEFAULT_CACHE_DIR
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', str(cache_dir))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    return cache_dir
