"""Platform helpers for this machine's tunneled TPU."""
from __future__ import annotations

import os


def respect_platform_env() -> None:
    """Re-assert the standard ``JAX_PLATFORMS`` env contract.

    This machine's sitecustomize pins the experimental axon TPU platform
    via jax.config at interpreter start, silently overriding the env var —
    so ``JAX_PLATFORMS=cpu python -m simpleslam_tpu.run_slam ...`` would
    still try to initialize the TPU tunnel (and hang if it is down). CLI
    entry points call this before touching any device."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        if (jax.config.jax_platforms or "") != plat:
            jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def enable_compile_cache(path: str = "/tmp/jax_cache") -> None:
    """Enable jax's persistent compilation cache — the remote TPU compiler
    takes minutes per program, so drivers should always reuse artifacts."""
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
