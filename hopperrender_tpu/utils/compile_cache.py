"""Persistent XLA compilation cache enablement.

The engine's executables are large (a 4K pyramid with per-step tier branches
takes minutes per compile on remote-compile platforms); a persistent on-disk
cache makes fresh processes (the CLI, bench.py, the driver's bench run) reuse
previously built executables. The reference pays the same cost once per run
via OpenCL program caching (clCreateProgramWithSource + driver cache,
ref: opticalFlowCalc.cpp:14-42 cl_create_kernel); this is the JAX equivalent,
opt-out via HRT_NO_JAX_CACHE=1.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent compilation cache directory (idempotent).
    Returns the directory, or None when disabled/unsupported."""
    if os.environ.get("HRT_NO_JAX_CACHE"):
        return None
    import jax

    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or os.path.join(os.path.dirname(os.path.dirname(
             os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # Cache everything that took meaningful compile time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return d
