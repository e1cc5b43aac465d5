"""ECC codes as vectorized reductions (reference steganosaur.cpp:461-547).

The reference encodes/decodes bit-by-bit in scalar loops; here each code is a
reshape + sum-reduction that vmaps/shards trivially. Live codes: Rep-3 (header)
and Rep-7 (payload). Rep-5 and Hamming(7,4) are dead code in the reference
pipeline (SURVEY.md §2 rows 19/21) but are part of its component inventory, so
they are provided for API parity.

All functions accept numpy or jax arrays of 0/1 bits and return the same kind.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _xp(bits):
    return jnp if isinstance(bits, jnp.ndarray) else np


def rep_encode(bits, n: int):
    """Repeat each bit n times (reference rep{3,5,7}_encode_bits)."""
    xp = _xp(bits)
    return xp.repeat(xp.asarray(bits), n)


def rep_decode(bits, n: int):
    """Majority vote over groups of n (reference rep{3,5,7}_decode_bits).

    Thresholds match the reference: >=2 of 3, >=3 of 5, >=4 of 7 — i.e.
    ceil((n+1)/2). Trailing partial groups are dropped (reference iterates
    i+n<=size). Length-multiple validation is the caller's job (the reference
    reports `ok=false` but still decodes; we mirror by returning the decode and
    letting the pipeline check lengths).
    """
    xp = _xp(bits)
    bits = xp.asarray(bits)
    m = (bits.shape[0] // n) * n
    groups = bits[:m].reshape(-1, n).astype(xp.int32)
    return (groups.sum(axis=1) >= (n + 1) // 2).astype(xp.uint8)


def rep_decode_soft(values, n: int):
    """Soft-decision repetition decode: bit = 1 iff the SUM of the n copies'
    decision values is >= 0 (ties -> 1, matching the hard rule's tie).

    Rebuild-only (no reference equivalent; the reference's decode is the
    hard majority above). The phase read's decision value for a copy is
    d = mag * sin(theta - jitter) * sign(sin alpha) (spectral/corner.py
    read_bits_dense without the final sign): under u8-quantization noise of
    roughly constant ABSOLUTE size per bin, d's signal-to-noise scales with
    the bin magnitude, so summing raw d values is the matched-filter
    combiner — a handful of weak flipped copies cannot outvote one strong
    correct copy, which is exactly the failure mode of the hard majority on
    heavy payloads (doc/HARDENING.md reliability model). Used as the
    recovery fallback: hard decode first (bit-packed gathers stay cheap),
    soft pass only for images whose AEAD failed (pipeline/batch.py).
    """
    xp = _xp(values) if not isinstance(values, np.ndarray) else np
    values = xp.asarray(values)
    m = (values.shape[0] // n) * n
    groups = values[:m].reshape(-1, n)
    return (groups.sum(axis=1) >= 0).astype(xp.uint8)


def rep3_encode(bits):
    return rep_encode(bits, 3)


def rep3_decode(bits):
    return rep_decode(bits, 3)


def rep5_encode(bits):
    return rep_encode(bits, 5)


def rep5_decode(bits):
    return rep_decode(bits, 5)


def rep7_encode(bits):
    return rep_encode(bits, 7)


def rep7_decode(bits):
    return rep_decode(bits, 7)


# --- Hamming(7,4): dead in the reference pipeline, kept for inventory parity
# (reference ham74_{encode,decode}_bits, steganosaur.cpp:510-547). ---

# Codeword layout: [p1, p2, d3, p3, d2, d1, d0].
_HAM_G = np.array(
    [
        # d3 d2 d1 d0 contributions to each of the 7 output bits
        [1, 1, 0, 1],  # p1 = d3^d2^d0
        [1, 0, 1, 1],  # p2 = d3^d1^d0
        [1, 0, 0, 0],  # d3
        [0, 1, 1, 1],  # p3 = d2^d1^d0
        [0, 1, 0, 0],  # d2
        [0, 0, 1, 0],  # d1
        [0, 0, 0, 1],  # d0
    ],
    dtype=np.uint8,
)


def ham74_encode(bits):
    xp = _xp(bits)
    bits = np.asarray(bits, dtype=np.uint8)
    pad = (-len(bits)) % 4
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    nibbles = bits.reshape(-1, 4)
    out = (nibbles @ _HAM_G.T) % 2
    return xp.asarray(out.reshape(-1).astype(np.uint8))


def ham74_decode(bits, orig_bits_len: int):
    xp = _xp(bits)
    bits = np.asarray(bits, dtype=np.uint8)
    m = (bits.shape[0] // 7) * 7
    cw = bits[:m].reshape(-1, 7).copy()
    c1, c2, c3, c4, c5, c6, c7 = (cw[:, i] for i in range(7))
    p1 = c1 ^ c3 ^ c5 ^ c7
    p2 = c2 ^ c3 ^ c6 ^ c7
    p3 = c4 ^ c5 ^ c6 ^ c7
    syndrome = p1 + (p2 << 1) + (p3 << 2)
    rows = np.arange(cw.shape[0])
    has_err = syndrome > 0
    cols = np.where(has_err, syndrome - 1, 0)
    flip = np.zeros_like(cw)
    flip[rows[has_err], cols[has_err]] = 1
    cw ^= flip
    data = cw[:, [2, 4, 5, 6]].reshape(-1)
    return xp.asarray(data[:orig_bits_len].astype(np.uint8))
