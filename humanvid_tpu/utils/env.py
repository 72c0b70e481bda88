"""Runtime environment helpers (compilation cache, mesh utilities)."""

from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_compilation_cache(path: str = "/root/.cache/jax_compilation") -> None:
    """Enable the persistent XLA compilation cache (idempotent).

    XLA compiles are slow on some hosts (CPU backend ~0.4 s per executable);
    TPU UNet compiles run 20-40 s. The disk cache makes warm starts ~free.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    if os.environ.get("HVT_PLATFORM"):
        # Uniform platform override for every entry point. The image's
        # sitecustomize imports jax at interpreter start with
        # JAX_PLATFORMS=axon, so the env var alone cannot retarget a script
        # (the config default is already latched); jax.config.update before
        # first backend use is the only reliable switch. Lets e.g. a metric
        # subprocess fall back to CPU when the remote-compile tunnel is
        # dropping (HVT_PLATFORM=cpu tools/eval_gate.py phases).
        import jax

        jax.config.update("jax_platforms", os.environ["HVT_PLATFORM"])
    if os.environ.get("HVT_NO_COMPILATION_CACHE"):
        # Opt-out: stale AOT entries compiled on a different host spam
        # cpu_aot_loader errors (harmless but noisy/slow); callers that need
        # a quiet, self-contained run set this.
        _CACHE_ENABLED = True
        return
    # HVT_CACHE_DIR points a process at a dedicated cache (e.g. the
    # multi-chip dryrun's repo-local CPU cache, pre-warmed so the driver's
    # re-run compiles in seconds instead of ~14 min)
    path = os.environ.get("HVT_CACHE_DIR", path)
    import jax
    from jax.experimental.compilation_cache import compilation_cache as cc

    os.makedirs(path, exist_ok=True)
    cc.set_cache_dir(path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # XLA-level caches deadlock lax.scan execution on this build (futex hang on
    # result materialization); the JAX-level executable cache alone is safe.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    _CACHE_ENABLED = True
