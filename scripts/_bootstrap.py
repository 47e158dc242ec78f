"""Common script bootstrap: repo-root import path + device selection."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force_cpu_if_requested():
    if os.environ.get("ETTS_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")


def enable_compilation_cache():
    """Persistent XLA compile cache shared by all drivers (CPU runs get a
    host-fingerprinted dir; see etts.utils.xla_cache)."""
    from etts.utils.xla_cache import enable_persistent_cache
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpu = bool(os.environ.get("ETTS_FORCE_CPU")
               or "cpu" in os.environ.get("JAX_PLATFORMS", "").lower())
    enable_persistent_cache(root, cpu)


force_cpu_if_requested()
enable_compilation_cache()
