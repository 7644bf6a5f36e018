"""Persistent XLA compilation cache.

Remote compilation on the TPU tunnel costs minutes per new graph shape;
caching compiled executables on disk makes every process after the first
start instantly. Call once before the first jit dispatch.
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / ".cache" / "jax"


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None) -> None:
    import jax

    path = Path(cache_dir) if cache_dir else _DEFAULT_DIR
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
