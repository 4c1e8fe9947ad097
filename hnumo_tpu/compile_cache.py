"""Persistent XLA compilation cache.

The model's jitted step is one large program (two barotropic solves x
N_btp x kstages unrolled stages inside lax.scan) whose TPU compile runs
minutes at large grids. Caching compiled executables on disk makes every
process after the first start in seconds — the TPU analog of the reference
only paying its Fortran compile once at build time.

Call enable() after importing jax, before the first jit execution. Safe to
call multiple times and on any backend; interacts fine with tests (CPU
executables cache too).
"""
from __future__ import annotations

import os


def enable(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "HNUMO_CACHE_DIR", os.path.expanduser("~/.cache/hnumo_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
