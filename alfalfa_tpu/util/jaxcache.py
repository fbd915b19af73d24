"""Persistent XLA compilation cache (compiles of the frame kernels are
expensive on TPU; cache them across processes)."""
import os

_enabled = False


def enable():
    global _enabled
    if _enabled:
        return
    try:
        import jax
        cache_dir = os.environ.get(
            "ALFALFA_JAX_CACHE",
            os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass
