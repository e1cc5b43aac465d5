"""Device->host transfer packing for uint8 payloads.

Measured on the tunneled TPU runtime (axon): device->host of a uint8 buffer
runs ~3 orders of magnitude slower than every other dtype (3 MB: u8 ~150 s;
i32/u32/f32/bf16 ~0.1 s). Host->device u8 is fine. The workaround is to end
each graph that returns image bytes with a bitcast of groups of 4 bytes into
float32 words (bit pattern preserved exactly — verified byte-for-byte) and
view them back as uint8 on the host. Pure plumbing: no arithmetic touches the
packed values, so this is lossless by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_u8(out_u8):
    """(B, ...) u8 device array -> (B, ceil(prod/4)) f32 words (in-graph).

    Trailing bytes are zero-padded to a multiple of 4; `unpack_u8` slices
    them off using the logical shape.
    """
    B = out_u8.shape[0]
    flat = out_u8.reshape(B, -1)
    pad = (-flat.shape[1]) % 4
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    return jax.lax.bitcast_convert_type(
        flat.reshape(B, -1, 4), jnp.float32
    )


def unpack_u8(host_f32: np.ndarray, shape: tuple[int, ...]) -> np.ndarray:
    """Host-side inverse of pack_u8: (B, m) f32 words -> `shape` u8 array."""
    B = shape[0]
    n = int(np.prod(shape[1:]))
    flat = np.ascontiguousarray(host_f32).view(np.uint8).reshape(B, -1)
    return flat[:, :n].reshape(shape)
