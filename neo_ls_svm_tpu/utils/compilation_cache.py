"""Persistent XLA compilation cache.

Cold-compiling the solver graphs costs tens of seconds on TPU; enabling JAX's
persistent compilation cache makes every process after the first reuse the compiled
executables (shape bucketing in the estimator keeps the set of distinct graphs small).
"""

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "NEO_LS_SVM_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "neo_ls_svm_tpu_xla")
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the on-disk XLA compilation cache; returns the cache directory."""
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
