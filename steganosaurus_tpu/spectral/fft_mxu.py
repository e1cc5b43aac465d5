"""MXU-backed 2D FFT: the DFT evaluated as f32 matrix products.

The reference computes its spectra with a scalar radix-2 Cooley-Tukey over
`complex<double>` (steganosaur.cpp:340-366). On TPU, `jnp.fft.fft2` lowers to
XLA's generic FFT which measures ~9 GFLOP/s effective on v5e — while the MXU
does dense f32 matmul orders of magnitude faster. Since every grid in this
pipeline is a power of two and static, the idiomatic TPU formulation is the
DFT as matrix products:

- direct: for N <= 512, y = x @ W with W[j, k] = e^{s*2*pi*i*jk/N} — one
  (batch, N) @ (N, N) matmul per axis, MXU-shaped.
- four-step: for larger N = N1*N2, the classic transpose algorithm
  (Bailey 1989): reshape j = j2*N1 + j1, inner DFT over j2 (N2-matmul),
  twiddle by w^{j1*k2}, outer DFT over j1 (N1-matmul), transpose. Cost
  N*(N1+N2) products per row instead of N^2, all in MXU-friendly tiles.

Sign convention matches the REFERENCE (forward w = e^{+2*pi*i/len},
steganosaur.cpp:347), i.e. the conjugate of numpy's; inverse divides by N
per axis. Complex arithmetic is carried as separate (re, im) f32 planes so
each complex matmul maps onto real MXU matmuls; DFT/twiddle constants are
built in float64 on the host and cast once at trace time.

Precision: matmuls run at HIGHEST precision (f32-faithful on the MXU) by
default. Payload parity only needs phase errors well under the alpha=0.5 rad
decision margin (SURVEY.md §7 "precision parity"); HIGHEST keeps spectra
within ~1e-4 of the f64 reference even at 4096-point transforms. A "fast"
bf16-multiply mode exists for throughput experiments; it is NOT used by
default because near-threshold bins lose margin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Largest N evaluated as one dense N x N matmul. Above this, a four-step
# split; sizes whose smallest prime factor exceeds this fall back to
# Bluestein's chirp-z over a pow2 grid.
_DIRECT_MAX = 512

# Hand-tuned pow2 (N1, N2) splits, biased toward MXU-native 128 tiles.
# Non-pow2 sizes (native-resolution grids, see spectral.fft_dims) get a
# computed split from _find_split.
_SPLIT = {
    1024: (128, 8),
    2048: (128, 16),
    4096: (128, 32),
    8192: (128, 64),
    16384: (128, 128),
}


@functools.lru_cache(maxsize=None)
def _find_split(N: int) -> tuple[int, int] | None:
    """Best (N1, N2) with N = N1*N2 for the four-step transform, or None.

    Prefers a balanced pair with both factors <= _DIRECT_MAX (cost per row
    ~ N*(N1+N2) MACs); otherwise takes the largest inner factor <= _DIRECT_MAX
    and recurses on the outer (N1 > _DIRECT_MAX splits again). None only when
    N's smallest prime factor exceeds _DIRECT_MAX (then: Bluestein).
    """
    if N in _SPLIT:
        return _SPLIT[N]
    divisors = [d for d in range(2, _DIRECT_MAX + 1) if N % d == 0]
    if not divisors:
        return None
    balanced = [d for d in divisors if N // d <= _DIRECT_MAX]
    if balanced:
        n2 = min(balanced, key=lambda d: (N // d) + d)
        return N // n2, n2
    n2 = max(divisors)
    return N // n2, n2

_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "fast": jax.lax.Precision.DEFAULT,
}


@functools.lru_cache(maxsize=None)
def _dft_mat(N: int, sign: int) -> tuple[np.ndarray, np.ndarray]:
    """(re, im) of W[j, k] = e^{sign * 2*pi*i * j*k / N}, float64 host-side."""
    jk = np.outer(np.arange(N), np.arange(N) % N)
    ang = (sign * 2.0 * np.pi / N) * (jk % N)
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=None)
def _twiddle(N1: int, N2: int, sign: int) -> tuple[np.ndarray, np.ndarray]:
    """(re, im) of T[k2, j1] = e^{sign * 2*pi*i * j1*k2 / (N1*N2)}."""
    N = N1 * N2
    k2j1 = np.outer(np.arange(N2), np.arange(N1))
    ang = (sign * 2.0 * np.pi / N) * k2j1
    return np.cos(ang), np.sin(ang)


def _cmm(xr, xi, wr, wi, precision):
    """Complex y = x @ W over the last axis, as real MXU matmuls."""
    yr = jnp.matmul(xr, wr, precision=precision) - jnp.matmul(
        xi, wi, precision=precision
    )
    yi = jnp.matmul(xr, wi, precision=precision) + jnp.matmul(
        xi, wr, precision=precision
    )
    return yr, yi


def _dft_last(xr, xi, N: int, sign: int, precision):
    """1D DFT of length N along the last axis of (re, im) f32 arrays."""
    if N <= _DIRECT_MAX:
        wr, wi = _dft_mat(N, sign)
        return _cmm(xr, xi, jnp.asarray(wr, xr.dtype), jnp.asarray(wi, xr.dtype),
                    precision)

    split = _find_split(N)
    if split is None:
        return _bluestein_last(xr, xi, N, sign, precision)
    N1, N2 = split
    lead = xr.shape[:-1]
    # j = j2*N1 + j1  ->  A[..., j2, j1]
    ar = xr.reshape(*lead, N2, N1)
    ai = xi.reshape(*lead, N2, N1)
    # inner DFT over j2: contract axis -2 with W2 (symmetric). Move j2 last.
    ar = jnp.swapaxes(ar, -1, -2)  # (..., j1, j2)
    ai = jnp.swapaxes(ai, -1, -2)
    br, bi = _dft_last(ar, ai, N2, sign, precision)  # (..., j1, k2)
    br = jnp.swapaxes(br, -1, -2)  # (..., k2, j1)
    bi = jnp.swapaxes(bi, -1, -2)
    # twiddle T[k2, j1]
    tr, ti = _twiddle(N1, N2, sign)
    tr = jnp.asarray(tr, xr.dtype)
    ti = jnp.asarray(ti, xr.dtype)
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    # outer DFT over j1: contract last axis with W1 -> (..., k2, k1)
    dr, di = _dft_last(cr, ci, N1, sign, precision)
    # y[k1*N2 + k2] = D[k2, k1]
    yr = jnp.swapaxes(dr, -1, -2).reshape(*lead, N)
    yi = jnp.swapaxes(di, -1, -2).reshape(*lead, N)
    return yr, yi


@functools.lru_cache(maxsize=None)
def _bluestein_consts(N: int, sign: int):
    """Host-side f64 constants for the chirp-z transform of length N.

    DFT as a linear convolution (Bluestein 1970): with
    w_m = e^{sign*pi*i*m^2/N}, y_k = w_k * sum_j (x_j*w_j) * conj(w)_{k-j}.
    Returns (chirp re/im of length N, FFT_M(kernel) re/im of length M) where
    M = next pow2 >= 2N-1 and the kernel is conj(w) wrapped circularly.
    The m^2 mod 2N reduction keeps the f64 phase argument exact.
    """
    M = 1
    while M < 2 * N - 1:
        M <<= 1
    m = np.arange(N, dtype=np.int64)
    ang = (sign * np.pi / N) * ((m * m) % (2 * N))
    w = np.cos(ang) + 1j * np.sin(ang)           # chirp
    kern = np.zeros(M, dtype=np.complex128)
    kern[:N] = np.conj(w)
    kern[M - N + 1:] = np.conj(w)[1:][::-1]      # kern[M-m] = conj(w_m)
    # Kernel spectrum under OUR forward convention (e^{+2pi i jk/M} for
    # sign=+1 pipelines and numpy's for sign=-1): any consistent FFT pair
    # works for the convolution; we match _dft_last's `sign` so the variable
    # transforms below can reuse it directly.
    if sign > 0:
        kf = np.conj(np.fft.fft(np.conj(kern)))   # sum kern_j e^{+2pi i jk/M}
    else:
        kf = np.fft.fft(kern)
    return (w.real, w.imag, kf.real, kf.imag, M)


def _bluestein_last(xr, xi, N: int, sign: int, precision):
    """Chirp-z DFT for awkward N (smallest prime factor > _DIRECT_MAX)."""
    wr_, wi_, kfr_, kfi_, M = _bluestein_consts(N, sign)
    wr = jnp.asarray(wr_, xr.dtype)
    wi = jnp.asarray(wi_, xr.dtype)
    kfr = jnp.asarray(kfr_, xr.dtype)
    kfi = jnp.asarray(kfi_, xr.dtype)
    # a = x * w, zero-padded to M
    ar = xr * wr - xi * wi
    ai = xr * wi + xi * wr
    pad = [(0, 0)] * (ar.ndim - 1) + [(0, M - N)]
    ar = jnp.pad(ar, pad)
    ai = jnp.pad(ai, pad)
    # circular convolution via the pow2 matmul-DFT path
    fr, fi = _dft_last(ar, ai, M, sign, precision)
    gr = fr * kfr - fi * kfi
    gi = fr * kfi + fi * kfr
    cr, ci = _dft_last(gr, gi, M, -sign, precision)  # inverse of the pair
    cr = cr[..., :N] * (1.0 / M)
    ci = ci[..., :N] * (1.0 / M)
    yr = cr * wr - ci * wi
    yi = cr * wi + ci * wr
    return yr, yi


def _fft2_parts(xr, xi, inverse: bool, precision):
    """2D transform over the last two axes of (re, im) f32 arrays."""
    sign = -1 if inverse else +1  # reference convention (steganosaur.cpp:347)
    PH, PW = xr.shape[-2], xr.shape[-1]
    # rows (last axis)
    xr, xi = _dft_last(xr, xi, PW, sign, precision)
    # columns: transpose, transform, transpose back
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    xr, xi = _dft_last(xr, xi, PH, sign, precision)
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    if inverse:
        scale = 1.0 / (PH * PW)
        xr = xr * scale
        xi = xi * scale
    return xr, xi


def fft2(planes, precision: str = "highest") -> jnp.ndarray:
    """Forward 2D FFT of real planes (..., PH, PW) -> complex64 spectrum.

    Reference sign convention (conjugate of numpy's forward). Drop-in for
    spectral.fft2.
    """
    xr = jnp.asarray(planes).astype(jnp.float32)
    xi = jnp.zeros_like(xr)
    yr, yi = _fft2_parts(xr, xi, False, _PRECISION[precision])
    return jax.lax.complex(yr, yi)


def ifft2_real(spectrum, precision: str = "highest") -> jnp.ndarray:
    """Inverse 2D FFT (reference convention), real part, f32."""
    xr = jnp.real(spectrum).astype(jnp.float32)
    xi = jnp.imag(spectrum).astype(jnp.float32)
    yr, _ = _fft2_parts(xr, xi, True, _PRECISION[precision])
    return yr
