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
    """Per-stage matmul modes for the corner DFTs
    (STEGANOSAURUS_MM_PRECISION). Returns a 4-tuple
    (stage1, fwd_stage2, ifft_stage2, ifft_stage1): stage1 covers the
    matmuls whose LHS operand is the exact u8 plane data, the others the
    contractions over intermediate f32 spectra.

    - "mix" (default): stage1 and BOTH delta-IFFT stages in true bf16
      (bf16 operands, f32 accumulation — full MXU rate, 6x HIGHEST); only
      the forward stage2 at HIGH (bf16_3x error compensation,
      ~f32-faithful products at 2x HIGHEST). Why this exact split, all
      measured at 4K/16KB:
        * stage1's operands are a u8 plane (every integer <= 255 is EXACT
          in bf16) and a cos/sin table (|e| <= 1, 2^-9 relative rounding).
          The product error is ~2^-9 * sqrt(W) * E|plane| ~ tens, absolute,
          per output element — two orders below the walk-bin signal
          (mag*sin(alpha) ~ 1e4 on typical covers).
        * the forward stage2's operands are partially-transformed spectra
          whose columns near x=0 carry the image's low-frequency energy —
          values up to ~1e6 next to walk-bin signals of ~1e4. bf16's 8-bit
          mantissa on THOSE operands puts ~0.2% of the large values onto
          the small ones after contraction: bit flips concentrated at
          low-x walk bins (full bf16 breaks 4K/16KB recovery, measured).
          bf16_3x error-compensates to ~f32 product accuracy, immune to
          the dynamic range.
        * the delta-IFFT operands carry the masked walk delta — no DC
          term, mild dynamic range — and bf16 there leaves the channel
          indistinguishable from highest: payload BER raw 0.00157 under
          mix, mix_conservative, and highest alike; post-ECC 0; recovery
          verified.
    - "mix_conservative": every stage2-class matmul at HIGH (~15% slower
      at 4K, no measured accuracy gain).
    - "high": bf16_3x everywhere (2x HIGHEST, no bf16 stage).
    - "highest": full f32 products everywhere — the parity arbiter.
    """
    import os

    name = os.environ.get("STEGANOSAURUS_MM_PRECISION", "mix").lower()
    HIGH, HIGHEST = jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST
    if name in ("mix", "mix3"):
        return ("bf16", HIGH, "bf16", "bf16")
    if name == "mix_conservative":
        return ("bf16", HIGH, HIGH, HIGH)
    if name == "mix2":
        return ("bf16", HIGH, "bf16", HIGH)
    if name == "bf16":  # experimental / measurement only
        return ("bf16", "bf16", "bf16", "bf16")
    p = HIGH if name == "high" else HIGHEST
    return (p, p, p, p)


def _mm(subscripts, a, b, precision):
    """einsum wrapper implementing the bf16-operand/f32-accumulate mode."""
    if precision == "bf16":
        return jnp.einsum(subscripts, a.astype(jnp.bfloat16),
                          b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum(subscripts, a, b, precision=precision)


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
    """HOST numpy (K, N) f32 tables (re, im) of exp(+2j*pi*k*n/N).

    The +2pi sign is the REFERENCE forward convention (conj of numpy's,
    steganosaur.cpp:347). The angle argument is reduced with an exact int64
    mod — so table phases are accurate to f32 sin/cos, not to a rounded
    float product.

    Host-built and passed to the corner cores as ARGUMENTS (never closure
    constants): a device array captured by a traced function is pulled back
    to host during lowering — measured at 469 s for ONE table over the
    tunneled runtime — and baked ~49 MB of table data into every compiled
    module variant. As arguments they upload once per placement
    (dft_tables_device) and every module shares them.
    """
    import numpy as np

    k = np.arange(K, dtype=np.int64)[:, None]
    n = np.arange(N, dtype=np.int64)[None, :]
    ang = ((k * n) % N).astype(np.float32) * np.float32(2.0 * math.pi / N)
    return np.cos(ang, dtype=np.float32), np.sin(ang, dtype=np.float32)


_DEV_TABLES: dict = {}


def dft_tables_device(H: int, Ky: int, W: int, Kx: int, mesh=None):
    """(eyr, eyi, exr, exi) device-resident f32 tables for an (H, W) grid's
    (Ky, Kx) corner — uploaded once per (dims, mesh) and cached (replicated
    over the mesh when given)."""
    key = (H, Ky, W, Kx, mesh)
    ent = _DEV_TABLES.get(key)
    if ent is None:
        eyr, eyi = _dft_tables(H, Ky)
        exr, exi = _dft_tables(W, Kx)
        if mesh is None:
            put = jax.device_put
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(mesh, PartitionSpec())
            put = lambda a: jax.device_put(a, sh)  # noqa: E731
        ent = tuple(put(a) for a in (eyr, eyi, exr, exi))
        _DEV_TABLES[key] = ent
        while len(_DEV_TABLES) > 16:
            _DEV_TABLES.pop(next(iter(_DEV_TABLES)))
    return ent


def fwd_corner(planes, eyr, eyi, exr, exi, precision):
    """planes (..., H, W) f32 real -> corner spectrum (re, im) (..., Ky, Kx).

    C[y, x] = sum_{h,w} planes[h,w] * e^{+2pi*i*(yh/H + xw/W)}; the big
    dimension (w) is contracted first so the widest matmul runs on the
    smaller operand. precision is the 4-tuple from precision(): stage1
    contracts the exact u8 planes, fwd_stage2 the f32 intermediates (see
    precision() for why they differ).

    Separate re/im dots beat a stacked single-dot formulation here
    (measured on TPU: stacking re/im into one (2K,·) dot per stage costs
    +10% step time — the concat/slice materialization adds HBM traffic XLA
    otherwise avoids).
    """
    p1, p2 = precision[0], precision[1]
    ar = _mm("...hw,xw->...hx", planes, exr, p1)
    ai = _mm("...hw,xw->...hx", planes, exi, p1)
    cr = (_mm("yh,...hx->...yx", eyr, ar, p2)
          - _mm("yh,...hx->...yx", eyi, ai, p2))
    ci = (_mm("yh,...hx->...yx", eyr, ai, p2)
          + _mm("yh,...hx->...yx", eyi, ar, p2))
    return cr, ci


def ifft_corner_real(dr, di, H, W, eyr, eyi, exr, exi, precision):
    """real(IFFT2(Delta)) for a corner-supported Delta = (dr, di).

    ifft2_real under the reference convention is
    (1/(H*W)) * Re( sum conj(Delta)[y,x] * e^{+2pi*i*(yh/H + xw/W)} )
    (spectral.ifft2_real). With Dc = conj(Delta) = (dr, -di):
    M = Ey^T @ Dc (contract y), then Re(M @ Ex) (contract x).

    Both stages contract the masked walk delta (mild dynamic range, no DC
    term) and run at precision()'s ifft modes (bf16 under the default mix;
    see precision()).

    Separate re/im dots, for the same measured reason as fwd_corner.
    """
    p2, p3 = precision[3], precision[2]
    dcr, dci = dr, -di
    mr = (_mm("yh,...yx->...hx", eyr, dcr, p2)
          - _mm("yh,...yx->...hx", eyi, dci, p2))
    mi = (_mm("yh,...yx->...hx", eyr, dci, p2)
          + _mm("yh,...yx->...hx", eyi, dcr, p2))
    t = (_mm("...hx,xw->...hw", mr, exr, p3)
         - _mm("...hx,xw->...hw", mi, exi, p3))
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
