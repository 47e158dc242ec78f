"""Common script bootstrap: repo-root import path + device selection."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force_cpu_if_requested():
    if os.environ.get("ETTS_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
