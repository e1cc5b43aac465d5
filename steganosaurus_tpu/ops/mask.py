"""Annulus/axis bin masks and capacity counting as device reductions.

Replaces the reference's per-bin capacity scan (steganosaur.cpp:997-1012) with
one boolean-plane reduction. Note the reference quirk (SURVEY.md §7 ledger):
capacity still applies the magnitude threshold that the walk itself ignores
(:1004 vs :797-799) — reproduced for parity of the "Message too large"
boundary.
"""

from __future__ import annotations

import jax.numpy as jnp


def eligibility_mask(H: int, W: int, rmin: float, rmax: float):
    """Boolean (H, W) plane: not on axis/DC/Nyquist and inside the annulus.

    The annulus uses raw index distance hypot(y, x) vs r{min,max}*min(H, W)
    (reference annulus_ok :771-774) — NOT centered; it hugs the low-frequency
    corner, mirrored bins qualify only via conjugate writes. The radius test is
    done on exact integer y^2+x^2 against f64 squared thresholds, avoiding f32
    sqrt boundary flips against the host walk's f64 hypot.
    """
    yy = jnp.arange(H, dtype=jnp.int32)[:, None]
    xx = jnp.arange(W, dtype=jnp.int32)[None, :]
    axis = (yy == 0) | (xx == 0)
    if H % 2 == 0:
        axis = axis | (yy == H // 2)
    if W % 2 == 0:
        axis = axis | (xx == W // 2)
    # int32 y^2+x^2 is exact; f32 holds it exactly below 2^24, and bins above
    # that are far outside any plausible annulus threshold.
    r2 = (yy * yy + xx * xx).astype(jnp.float32)
    rlo = float(rmin * min(H, W)) ** 2
    rhi = float(rmax * min(H, W)) ** 2
    return (~axis) & (r2 >= rlo) & (r2 <= rhi)


def capacity_bits(spectrum, thresholds, rmin: float, rmax: float):
    """Usable bit capacity (reference count_plane :998-1008).

    Per plane: bins passing the eligibility mask with |F| >= threshold, halved
    (each conjugate pair carries one bit; conj==self never passes the axis
    exclusion on even grids). Returns a scalar int32.
    """
    H, W = spectrum.shape[-2:]
    mask = eligibility_mask(H, W, rmin, rmax)
    magok = jnp.abs(spectrum) >= thresholds[:, None, None]
    per_plane = (mask[None, :, :] & magok).sum(axis=(-2, -1)) // 2
    return per_plane.sum().astype(jnp.int32)
