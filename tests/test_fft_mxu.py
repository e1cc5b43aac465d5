"""MXU matmul-FFT (spectral/fft_mxu.py) correctness vs numpy float64.

The mxu implementation is the TPU default (spectral._default_impl); tests run
it on CPU against the f64 reference convention spectrum (conj of numpy's
forward — steganosaur.cpp:347) and through the full embed/extract pipeline.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from steganosaurus_tpu import spectral
from steganosaurus_tpu.spectral import fft_mxu


def _ref_spectrum(planes):
    return np.conj(np.fft.fft2(planes.astype(np.float64)))


@pytest.mark.parametrize("N", [64, 128, 512, 1024, 2048,
                                # non-pow2: the production TPU path for
                                # native-size 1080p/4K grids (four-step
                                # split) and the Bluestein chirp-z fallback
                                # (prime > 512). CPU tests otherwise route
                                # these to jnp.fft and never exercise them.
                                96, 541, 1080])
def test_forward_matches_f64(N):
    rng = np.random.default_rng(N)
    x = rng.uniform(0, 255, (2, N, N)).astype(np.float32)
    ref = _ref_spectrum(x)
    got = np.asarray(jax.jit(fft_mxu.fft2)(x))
    # error budget: phase decisions have a 0.5 rad margin; spectra agree to
    # ~1e-3 relative of the mean magnitude even at 2048 (measured ~5e-4).
    scale = np.abs(ref).mean()
    assert np.abs(got - ref).max() / scale < 2e-3


@pytest.mark.parametrize("N", [64, 512, 1024, 541, 1080])
def test_roundtrip_identity(N):
    rng = np.random.default_rng(N + 1)
    x = rng.uniform(0, 255, (1, N, N)).astype(np.float32)
    back = np.asarray(jax.jit(lambda a: fft_mxu.ifft2_real(fft_mxu.fft2(a)))(x))
    assert np.abs(back - x).max() < 0.01  # far under the 0.5 u8 rounding step


def test_nonsquare():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 255, (3, 128, 512)).astype(np.float32)
    ref = _ref_spectrum(x)
    got = np.asarray(jax.jit(fft_mxu.fft2)(x))
    assert np.abs(got - ref).max() / np.abs(ref).mean() < 2e-3


def test_sign_convention_matches_xla_impl():
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 255, (1, 256, 256)).astype(np.float32)
    a = np.asarray(spectral.fft2(x, impl="xla"))
    b = np.asarray(spectral.fft2(x, impl="mxu"))
    assert np.abs(a - b).max() / np.abs(a).mean() < 2e-3


def test_pipeline_roundtrip_with_mxu_impl(small_image):
    """Full embed->extract round-trip with the TPU-default FFT impl."""
    from steganosaurus_tpu.config import Params
    from steganosaurus_tpu.pipeline.embed import embed_array
    from steganosaurus_tpu.pipeline.extract import extract_array

    spectral.set_impl("mxu")
    try:
        p = Params(pbkdf2_iter=100)
        secret = b"mxu fft impl roundtrip"
        res = embed_array(small_image, secret, password="pw", params=p)
        got = extract_array(res.stego, password="pw", params=p)
        assert got == secret
    finally:
        spectral.set_impl(None)
