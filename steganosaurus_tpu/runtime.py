"""Runtime setup helpers (compilation cache, mesh utilities entry point)."""

from __future__ import annotations

import hashlib
import os
import pathlib


def _host_fingerprint() -> str:
    """Short hash of the host CPU feature set.

    The repo (and its .cache/) moves between machines across rounds; XLA:CPU
    AOT executables compiled with one machine's features can SIGILL or
    miscompute on another (observed: `+prefer-no-gather` mismatch poisoning a
    cached executable). Keying the cache dir on the CPU flags isolates hosts.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return hashlib.sha256(os.uname().version.encode()).hexdigest()[:10]


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
            str(
                pathlib.Path(__file__).resolve().parent.parent
                / ".cache"
                / f"jax-{_host_fingerprint()}"
            ),
        )
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
