"""Shared JAX configuration: persistent compilation cache.

The remote-TPU compile path has a multi-minute cold start for the first
nontrivial program in a session; the persistent cache makes reruns skip
remote compiles entirely. Called by the CLI, bench, and graft entries."""

import os

_done = False


def setup_jax_cache(cache_dir: str = None) -> None:
    global _done
    if _done:
        return
    _done = True
    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
