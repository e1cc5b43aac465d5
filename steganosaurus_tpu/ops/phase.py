"""Phase-domain embed/extract as one vectorized gather -> rotate -> scatter.

Replaces the reference's sequential per-bit `write_bit_on_bin` /
`read_bit_from_bin` (steganosaur.cpp:698-746) with batched device ops over the
index arrays produced by host keystream expansion. The turtle guarantees every
selected bin and its Hermitian mirror are distinct and selected at most once
(axis/Nyquist bins are rejected, visited marks both of a pair), so the two
scatters are conflict-free.
"""

from __future__ import annotations

import jax.numpy as jnp


def conj_indices(y, x, H: int, W: int):
    """Vectorized Hermitian mirror index (reference conj_idx, :370-372)."""
    cy = jnp.where(y == 0, 0, H - y) % H
    cx = jnp.where(x == 0, 0, W - x) % W
    return cy, cx


def adaptive_alpha(base_alpha, mag, median_mag, enabled: bool):
    """alpha * clamp(mag/median, 0.5, 2.0) when enabled (reference :704-710)."""
    if not enabled:
        return jnp.broadcast_to(jnp.asarray(base_alpha, mag.dtype), mag.shape)
    scale = jnp.clip(mag / jnp.maximum(1e-12, median_mag), 0.5, 2.0)
    return base_alpha * scale


def embed_phases(spectrum, plane, y, x, bits, jitters, alpha, medians,
                 adaptive: bool, gain: float = 1.0,
                 hermitian_half: bool = False):
    """Write `bits` into the phases of the selected bins.

    Per bin (reference write_bit_on_bin, :712-732): keep magnitude, set phase
    to (bit ? +a : -a) + jitter where a may be magnitude-adaptive; mirror the
    conjugate bin. Self-conjugate bins cannot occur (axis/Nyquist rejected by
    the walk), so the forced-real branch (:726-731) is unreachable here.

    gain: crop retention factor (H*W)/(PH*PW). Cropping the padded IFFT back
    to H x W multiplies every written spectral delta by `gain` when the stego
    is re-FFT'd (the cover passes through unchanged — it is window-supported).
    The REFERENCE ignores this and silently fails on every non-pow2 image
    (verified: its own embed->extract at 1080p/4K returns "Magic not found").
    Writing v + (target - v)/gain pre-compensates so the measured bin reads
    exactly target; at pow2 sizes gain == 1 and this reduces bit-identically
    to the reference's magnitude-preserving write.

    hermitian_half: write only the primary bins, pre-doubled. Consumers that
    take real(IFFT(S)) — both FFT backends do — see the effective spectrum
    (S + mirror(conj(S)))/2, so writing 2*nv - v at bin k while leaving the
    stale conj(v) at its mirror yields exactly nv effective (and conj(nv) at
    the mirror). This HALVES the scatter, the embed graph's dominant cost on
    TPU (XLA scatter is ~8M updates/s). Bit-identical in exact arithmetic to
    the mirrored write; the f64 numpy backend keeps the literal reference
    form as the parity oracle.

    spectrum: (3, PH, PW) complex. plane/y/x/bits: (nbits,) int32.
    jitters: (nbits,) float. medians: (3,) float.
    """
    H, W = spectrum.shape[-2:]
    real_dtype = jnp.zeros(0, spectrum.dtype).real.dtype
    v = spectrum[plane, y, x]
    mag = jnp.maximum(1e-12, jnp.abs(v)).astype(real_dtype)
    a = adaptive_alpha(alpha, mag, medians[plane].astype(real_dtype), adaptive)
    theta = jnp.where(bits.astype(bool), a, -a) + jitters.astype(real_dtype)
    nv = (mag * jnp.exp(1j * theta.astype(real_dtype))).astype(spectrum.dtype)
    if gain != 1.0:
        nv = v + (nv - v) / jnp.asarray(gain, real_dtype)
    if hermitian_half:
        # No unique_indices promise: the batch path pads index arrays to the
        # bucket size by repeating the last walk bin, so duplicates (carrying
        # identical values) are the norm, and XLA defines duplicate scatter
        # under unique_indices=True as UB. Measured: the promise buys nothing
        # on TPU scatter throughput anyway.
        return spectrum.at[plane, y, x].set(
            2.0 * nv - v, mode="promise_in_bounds")
    cy, cx = conj_indices(y, x, H, W)
    out = spectrum.at[plane, y, x].set(nv)
    out = out.at[plane, cy, cx].set(jnp.conj(nv))
    return out


def read_phases(spectrum, plane, y, x, jitters, alpha, medians, adaptive: bool):
    """Read bits back from bin phases.

    Decision (reference read_bit_from_bin, :734-746): bit = 1 iff the circular
    distance from the bin phase to (jitter + a) is <= the distance to
    (jitter - a). Since circular distance d(u,v) in [0, pi] satisfies
    cos(d) = cos(u - v) and cos is monotone decreasing on [0, pi], this is
    exactly cos(th - j - a) >= cos(th - j + a), with ties -> 1 as in the
    reference's `dpos <= dneg`.
    """
    v = spectrum[plane, y, x]
    th = jnp.angle(v)
    mag = jnp.maximum(1e-12, jnp.abs(v))
    a = adaptive_alpha(alpha, mag, medians[plane], adaptive)
    base = th - jitters
    return (jnp.cos(base - a) >= jnp.cos(base + a)).astype(jnp.uint8)
