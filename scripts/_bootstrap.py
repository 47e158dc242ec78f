"""Common script bootstrap: repo-root import path + device selection."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force_cpu_if_requested():
    if os.environ.get("ETTS_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")


def enable_compilation_cache():
    """Persistent XLA compile cache shared by all drivers.

    CPU runs get their own dir: XLA:CPU AOT entries embed host machine
    features, so entries written on a different host poison every lookup
    (load-and-reject churn, SIGILL risk) while TPU entries stay valid.
    """
    import jax
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpu = (os.environ.get("ETTS_FORCE_CPU")
           or "cpu" in os.environ.get("JAX_PLATFORMS", "").lower())
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, ".jax_cache_cpu" if cpu
                                       else ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


force_cpu_if_requested()
enable_compilation_cache()
