"""Common script bootstrap: repo-root import path + device selection."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force_cpu_if_requested():
    if os.environ.get("ETTS_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")


def enable_compilation_cache():
    """Persistent XLA compile cache shared by all drivers."""
    import jax
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


force_cpu_if_requested()
enable_compilation_cache()
