"""Corner-restricted spectral embed/extract math (the 4K fast path).

The turtle walk accepts only bins with hypot(y, x) <= rmax*min(H, W) on RAW
indices and y, x >= 1 (reference annulus check, steganosaur.cpp:791-795;
keystream/_pure.py turtle_expand), so every primary bin lives in the
[0, K) x [0, K) top-left corner of the spectrum, K = floor(rmax*min(H,W))+1.
Under the Hermitian-half write (ops/phase.py) the embed is

    stego = planes + real(IFFT2(Delta)),   supp(Delta) subset corner,

because real(IFFT2(FFT2(planes))) == planes exactly (native-size grids,
spectral.fft_dims). This module evaluates both directions as pruned-DFT MXU
matmuls — O(K/N) of the full transform — and replaces the per-bin
scatter/gather with dense elementwise math over the corner:

- phase WRITE: new value at a bin is mag*exp(i*(jd + s*alpha)) with s = +-1
  from the bit; as a dense op it needs only a static position map (which walk
  slot owns each bin), a per-image bit-sign plane, and static jitter maps.
- phase READ (reference read_bit_from_bin, :734-746): bit = 1 iff
  cos(th - jd - a) >= cos(th - jd + a)  <=>  sin(th - jd) * sin(a) >= 0,
  i.e. sign(sin a) * (Im(C)*cos(jd) - Re(C)*sin(jd)) >= 0 — no per-bin trig,
  no gather, and alpha enters only through the scalar sign(sin(alpha))
  (ties decode as 1, matching the reference's `dpos <= dneg`).

Complex values are carried as (re, im) float32 pairs throughout: the
tunneled TPU runtime cannot transfer complex64 at all, and explicit pairs
keep every matmul a plain f32 MXU op.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def precision():
    """Matmul precision for the corner DFTs (default HIGHEST = full f32).

    STEGANOSAURUS_MM_PRECISION=high selects bf16_3x (~2x MXU throughput);
    phase decision margins (alpha=0.5 rad vs ~1e-5 rad transform error)
    leave lots of room, but HIGHEST stays the default until a config is
    BER-validated at HIGH.
    """
    import os

    name = os.environ.get("STEGANOSAURUS_MM_PRECISION", "highest").lower()
    return jax.lax.Precision.HIGH if name == "high" else jax.lax.Precision.HIGHEST


def corner_dims(H: int, W: int, rmax: float) -> tuple[int, int]:
    """(Ky, Kx) corner size covering every walk-accepted primary bin.

    hypot(y, x) <= rmax*min(H,W) implies y, x <= floor(rmax*min(H,W)), so
    K = floor(..)+1 rows/cols suffice; rounded up to 256 for MXU-friendly
    matmul shapes and clamped to the grid (small images degenerate to the
    full DFT, which is still exact).
    """
    b = int(math.floor(rmax * min(H, W))) + 1
    k = -(-b // 256) * 256
    return min(k, H), min(k, W)


@functools.lru_cache(maxsize=16)
def _dft_tables(N: int, K: int):
    """Device-resident (K, N) f32 tables (re, im) of exp(+2j*pi*k*n/N).

    The +2pi sign is the REFERENCE forward convention (conj of numpy's,
    steganosaur.cpp:347). The angle argument is reduced with an exact int32
    mod — k*n fits int32 for every supported size (K*N < 2^31) — so table
    phases are accurate to f32 sin/cos, not to a rounded float product.
    Built on device (one tiny jit): the tunnel uploads nothing.
    """
    assert K * N < 2**31

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def build(N, K):
        k = jnp.arange(K, dtype=jnp.int32)[:, None]
        n = jnp.arange(N, dtype=jnp.int32)[None, :]
        m = (k * n) % N
        ang = m.astype(jnp.float32) * jnp.float32(2.0 * math.pi / N)
        return jnp.cos(ang), jnp.sin(ang)

    return build(N, K)


def fwd_corner(planes, eyr, eyi, exr, exi, precision):
    """planes (..., H, W) f32 real -> corner spectrum (re, im) (..., Ky, Kx).

    C[y, x] = sum_{h,w} planes[h,w] * e^{+2pi*i*(yh/H + xw/W)}; the big
    dimension (w) is contracted first so the widest matmul runs on the
    smaller operand.
    """
    ar = jnp.einsum("...hw,xw->...hx", planes, exr, precision=precision)
    ai = jnp.einsum("...hw,xw->...hx", planes, exi, precision=precision)
    cr = (jnp.einsum("yh,...hx->...yx", eyr, ar, precision=precision)
          - jnp.einsum("yh,...hx->...yx", eyi, ai, precision=precision))
    ci = (jnp.einsum("yh,...hx->...yx", eyr, ai, precision=precision)
          + jnp.einsum("yh,...hx->...yx", eyi, ar, precision=precision))
    return cr, ci


def ifft_corner_real(dr, di, H, W, eyr, eyi, exr, exi, precision):
    """real(IFFT2(Delta)) for a corner-supported Delta = (dr, di).

    ifft2_real under the reference convention is
    (1/(H*W)) * Re( sum conj(Delta)[y,x] * e^{+2pi*i*(yh/H + xw/W)} )
    (spectral.ifft2_real). With Dc = conj(Delta) = (dr, -di):
    M = Ey^T @ Dc (contract y), then Re(M @ Ex) (contract x).
    """
    dcr, dci = dr, -di
    mr = (jnp.einsum("yh,...yx->...hx", eyr, dcr, precision=precision)
          - jnp.einsum("yh,...yx->...hx", eyi, dci, precision=precision))
    mi = (jnp.einsum("yh,...yx->...hx", eyr, dci, precision=precision)
          + jnp.einsum("yh,...yx->...hx", eyi, dcr, precision=precision))
    t = (jnp.einsum("...hx,xw->...hw", mr, exr, precision=precision)
         - jnp.einsum("...hx,xw->...hw", mi, exi, precision=precision))
    return t * jnp.float32(1.0 / (H * W))


def write_delta(cr, ci, sign, mask, cos_a, sin_a, cjd=None, sjd=None):
    """Dense phase-write delta over the corner (reference write_bit_on_bin,
    steganosaur.cpp:712-732, vectorized to the whole corner at once).

    cr/ci: (..., Ky, Kx) corner spectrum. sign: per-image bit sign (+1/-1)
    f32, same shape. mask: (3, Ky, Kx) f32 1.0 where a walk bin lives.
    cos_a/sin_a: scalars cos(alpha), sin(alpha). cjd/sjd: static per-walk
    cos/sin jitter maps (3, Ky, Kx), or None when jitter == 0.

    Returns (dr, di) with value 2*(nv - v) at walk bins (the Hermitian-half
    pre-doubled write; consumers take real(IFFT), ops/phase.py) and 0
    elsewhere. mag uses the same 1e-12 floor as ops.phase.embed_phases.
    """
    mag = jnp.sqrt(cr * cr + ci * ci)
    mag = jnp.maximum(jnp.float32(1e-12), mag)
    if cjd is None:
        cos_t = cos_a
        sin_t = sign * sin_a
    else:
        # theta = jd + s*alpha
        cos_t = cjd * cos_a - sign * (sjd * sin_a)
        sin_t = sjd * cos_a + sign * (cjd * sin_a)
    dr = (2.0 * mask) * (mag * cos_t - cr)
    di = (2.0 * mask) * (mag * sin_t - ci)
    return dr, di


def read_bits_dense(cr, ci, sign_sin_a, cjd=None, sjd=None):
    """Dense phase read: u8 bit plane over the corner.

    bit = 1 iff sign(sin a) * sin(th - jd) >= 0 (see module docstring); with
    sin(a) == 0 the decision value is exactly 0 and every bit decodes 1,
    matching the reference's tie rule.
    """
    if cjd is None:
        d = ci
    else:
        d = ci * cjd - cr * sjd
    return (d * sign_sin_a >= 0).astype(jnp.uint8)
