"""Keyed turtle-walk keystream expansion (host side).

The reference's only strictly sequential component (steganosaur.cpp:665-810) —
each accepted bin mutates the visited set, gating the next step — cannot be
vmapped. We run it on the host (C++ when built, pure Python otherwise) and feed
the resulting index arrays to one vectorized device pass.
"""

from __future__ import annotations

import numpy as np

from steganosaurus_tpu import _native_loader
from steganosaurus_tpu.keystream import _pure
from steganosaurus_tpu.keystream._pure import (  # noqa: F401 (re-exported API)
    KS,
    conj_idx,
    on_axis,
    turtle_seed,
)


def turtle_expand(
    walk_key: bytes,
    plane_keys: tuple[bytes, bytes, bytes],
    H: int,
    W: int,
    rmin: float,
    rmax: float,
    density: float,
    jitter_max: float,
    nbits: int,
    max_steps: int | None = None,
    allow_short: bool = False,
) -> tuple:
    """Per-bit (plane, y, x, jitter) arrays for `nbits` embedded bits.

    See `_pure.turtle_expand` for exact semantics and reference citations.

    allow_short=False (default): raises RuntimeError if the walk exhausts its
    step budget (image too small for nbits); returns a 4-tuple.
    allow_short=True: on exhaustion the tail is padded with the last valid bin
    and a 5-tuple (plane, y, x, jitter, nproduced) is returned — extraction
    uses this so an oversized gather (hinted or corrupt-clen) degrades to
    garbage trailing bits instead of aborting the batch.
    """
    if max_steps is None:
        max_steps = max(1_000_000, 64 * nbits * 8)
    lib = _native_loader.get()
    if lib is not None:
        p, y, x, j, n = lib.turtle_expand(
            walk_key, plane_keys, H, W, rmin, rmax, density, jitter_max,
            nbits, max_steps, allow_short=allow_short,
        )
        return (p, y, x, j, n) if allow_short else (p, y, x, j)
    return _pure.turtle_expand(
        walk_key, plane_keys, H, W, rmin, rmax, density, jitter_max,
        nbits, max_steps, allow_short=allow_short,
    )
