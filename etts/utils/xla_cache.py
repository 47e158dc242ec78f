"""Persistent XLA compile-cache wiring shared by every entry point.

TPU executables are host-independent, so they share one ``.jax_cache``.
XLA:CPU AOT entries embed the compiling host's machine-feature list and are
rejected (churn, SIGILL risk) when loaded on a different host — CPU runs get
a cache dir keyed on the host's CPU feature set so each host's cache is
self-consistent across rounds/VM migrations.
"""
import hashlib
import os

__all__ = ["enable_persistent_cache", "force_cpu_if_requested"]


def force_cpu_if_requested():
    """Honor ETTS_FORCE_CPU=1 (sitecustomize pins jax_platforms=axon, so an
    env var alone cannot switch backends — this must run before first device
    use). scripts/ get it via _bootstrap; root-level CLIs call it directly."""
    if os.environ.get("ETTS_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo", encoding="utf-8") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.md5(feats.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.md5(platform.processor().encode()).hexdigest()[:8]


def enable_persistent_cache(root: str, cpu: bool):
    """Point jax's persistent compile cache at ``root``; never raises."""
    import jax
    try:
        # callers pass their env-based detection; also honor a forced
        # jax_platforms=cpu config (ETTS_FORCE_CPU-style overrides)
        cpu = cpu or (jax.config.jax_platforms or "").lower().startswith("cpu")
        name = (f".jax_cache_cpu_{_host_fingerprint()}" if cpu
                else ".jax_cache")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, name))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
