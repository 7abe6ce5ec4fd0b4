"""Platform helpers for this machine's tunneled TPU."""
from __future__ import annotations

import os


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
