"""MSB-first bit/byte packing (reference steganosaur.cpp:446-459).

numpy's packbits/unpackbits are already MSB-first (bitorder='big'), matching
`bits_from_bytes`/`bytes_from_bits` exactly, including zero-padding of a
trailing partial byte on pack.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bits_from_bytes(data: bytes | np.ndarray) -> np.ndarray:
    """bytes -> 0/1 uint8 array, MSB first (reference :455-459)."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    return np.unpackbits(arr)


def bytes_from_bits(bits: np.ndarray) -> bytes:
    """0/1 array -> bytes, MSB first, zero-padded (reference :447-454)."""
    return np.packbits(np.asarray(bits, dtype=np.uint8)).tobytes()


def jnp_bytes_from_bits(bits):
    """Device-side packbits: (8k,) bits -> (k,) uint8 via weighted reshape-sum."""
    bits = jnp.asarray(bits, jnp.int32)
    m = (bits.shape[0] + 7) // 8 * 8
    if m != bits.shape[0]:
        bits = jnp.pad(bits, (0, m - bits.shape[0]))
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return (bits.reshape(-1, 8) * weights).sum(axis=1).astype(jnp.uint8)
