"""End-to-end embed/extract round-trip property tests (BASELINE.json configs)."""

import numpy as np
import pytest

from steganosaurus_tpu.config import Params
from steganosaurus_tpu.pipeline.embed import embed_array
from steganosaurus_tpu.pipeline.extract import extract_array
from steganosaurus_tpu.pipeline.errors import StegoError

FAST = dict(pbkdf2_iter=500)


def _roundtrip(img, secret, params, **kw):
    res = embed_array(img, secret, params=params, **kw)
    out = extract_array(res.stego, params=params, **kw)
    assert out == secret
    return res


@pytest.mark.parametrize("dtype", ["complex64", "complex128"])
def test_defaults(small_image, dtype):
    p = Params(fft_dtype=dtype, **FAST)
    res = _roundtrip(small_image, b"Hello World!", p, password="pw")
    assert res.payload_bytes == 12


def test_long_message(host_image):
    p = Params(**FAST)
    secret = bytes(range(256)) * 2  # 512 bytes, exercises binary payloads
    _roundtrip(host_image, secret, p, password="long pass phrase!")


def test_raw_key_mode(small_image):
    p = Params(**FAST)
    mk = bytes(range(32))
    _roundtrip(small_image, b"keyed secret", p, master_key=mk)


def test_jitter(small_image):
    p = Params(jitter=0.05, **FAST)
    _roundtrip(small_image, b"jittery", p, password="pw")


def test_adaptive_alpha(small_image):
    """BASELINE config 4. Device-side adaptive alpha round-trips (the
    magnitude-median recomputation on the stego spectrum is close enough that
    Rep-7 absorbs the residual flips — same mechanism as the reference)."""
    p = Params(adaptive_alpha=True, **FAST)
    _roundtrip(small_image, b"adaptive", p, password="pw")


def test_cover_dependent_path(small_image):
    """BASELINE config 5: spectral-hash-keyed walk."""
    p = Params(cover_dependent_path=True, **FAST)
    _roundtrip(small_image, b"cover-keyed", p, password="pw")


@pytest.mark.parametrize("density", [0.3, 0.7, 0.95])
def test_density_sweep(small_image, density):
    p = Params(density=density, **FAST)
    _roundtrip(small_image, b"dense", p, password="pw")


@pytest.mark.parametrize("rmin,rmax", [(0.05, 0.45), (0.10, 0.30), (0.02, 0.48)])
def test_annulus_sweep(small_image, rmin, rmax):
    p = Params(rmin=rmin, rmax=rmax, **FAST)
    _roundtrip(small_image, b"annulus", p, password="pw")


def test_alpha_sweep(small_image):
    for alpha in (0.22, 0.5, 1.0):
        p = Params(alpha=alpha, **FAST)
        _roundtrip(small_image, b"alpha", p, password="pw")


def test_center_mode(small_image):
    p = Params(center=True, **FAST)
    _roundtrip(small_image, b"centered", p, password="pw")


def test_rectangular_image():
    rng = np.random.default_rng(11)
    img = np.clip(190 + rng.integers(-20, 21, (96, 200, 3)), 0, 255).astype(np.uint8)
    p = Params(**FAST)
    _roundtrip(img, b"rect", p, password="pw")  # pads to 128x256


def test_wrong_password_fails_fast(small_image):
    p = Params(**FAST)
    res = embed_array(small_image, b"secret", password="right", params=p)
    with pytest.raises(StegoError, match="Magic not found"):
        extract_array(res.stego, password="wrong", params=p)


def test_capacity_exceeded(small_image):
    p = Params(**FAST)
    with pytest.raises(StegoError, match="Message too large"):
        embed_array(small_image, b"x" * 5000, password="pw", params=p)


def test_psnr_imperceptibility(host_image):
    """Stego quality bar: PSNR > 50 dB (README.md:137 guidance)."""
    p = Params(**FAST)
    res = embed_array(host_image, b"Hello World!", password="pw", params=p)
    mse = np.mean((host_image.astype(np.float64) - res.stego.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / mse)
    assert psnr > 50.0, psnr


def test_deterministic_with_fixed_salt(small_image):
    p = Params(**FAST)
    salt = bytes(16)
    a = embed_array(small_image, b"det", password="pw", params=p, salt=salt)
    b = embed_array(small_image, b"det", password="pw", params=p, salt=salt)
    np.testing.assert_array_equal(a.stego, b.stego)
