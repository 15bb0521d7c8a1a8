"""Process-level JAX runtime knobs shared by the CLI entry points."""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    """Persistent compilation cache: phase recompiles and watchdog
    restarts cost minutes each through the TPU tunnel; cached
    executables make them near-free. Backends that cannot serialize
    executables just log a warning and skip caching."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # config name drift across jax versions
        print(f"[warn] compilation cache unavailable: {e}", flush=True)
