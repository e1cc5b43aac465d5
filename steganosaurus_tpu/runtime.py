"""Runtime setup helpers (compilation cache, mesh utilities entry point)."""

from __future__ import annotations

import os
import pathlib


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    First TPU compiles are 20-40s; the cache makes subsequent CLI/bench runs
    start hot. Called by the CLI and bench entry points (not on library import
    — libraries shouldn't mutate global config).
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "STEGANOSAURUS_JAX_CACHE",
            str(pathlib.Path(__file__).resolve().parent.parent / ".cache" / "jax"),
        )
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
