"""Persistent XLA compilation cache.

The jitted pipelines are large graphs (a full FTP forward pass compiles in
minutes on first trace); enabling JAX's persistent cache makes every
subsequent process start in seconds.  Call before the first compilation.
"""
import os


def enable(path: str = None) -> None:
    import jax

    if path is None:
        path = os.environ.get(
            "VISTAF_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only
