"""Batched pipeline tests: ragged secrets, mesh sharding, cross-consistency
with the single-image pipeline, and per-image failure isolation."""

import jax
import numpy as np
import pytest

from steganosaurus_tpu.config import Params
from steganosaurus_tpu.parallel import batch as pbatch
from steganosaurus_tpu.pipeline.batch import embed_batch, extract_batch
from steganosaurus_tpu.pipeline.extract import extract_array

FAST = dict(pbkdf2_iter=500)


@pytest.fixture(scope="module")
def covers():
    rng = np.random.default_rng(21)
    base = np.linspace(170, 225, 128)
    imgs = base[None, None, :, None] + rng.integers(-12, 13, (6, 128, 128, 3))
    return np.clip(imgs, 0, 255).astype(np.uint8)


def test_embed_extract_batch_ragged(covers):
    p = Params(**FAST)
    secrets = [b"a", b"bb", b"ccc", b"x" * 40, b"hello world", b"z"]
    res = embed_batch(covers, secrets, password="pw", params=p)
    assert res.stego.shape == covers.shape
    got = extract_batch(res.stego, password="pw", params=p)
    assert got == secrets


def test_batch_1080p_multikb_payload():
    """BASELINE config 2: 1080p covers, multi-KB secrets (Rep-3 header +
    Rep-7 payload). Non-pow2 dims run at native spectral size — the reference
    binary cannot round-trip these at all (see test_rectangular_image).

    A 4 KB secret uses ~60% of the 1080p walk capacity, where the Rep-3
    header has a small per-salt failure probability (same BER physics as the
    reference) — verify=True is the production mechanism that re-salts until
    read-back succeeds, making recovery deterministic."""
    rng = np.random.default_rng(31)
    base = np.linspace(140, 230, 1920)
    covers = np.clip(base[None, None, :, None]
                     + rng.integers(-25, 26, (2, 1080, 1920, 3)),
                     0, 255).astype(np.uint8)
    p = Params(**FAST)
    secrets = [bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
               bytes(rng.integers(0, 256, 2000, dtype=np.uint8))]
    res = embed_batch(covers, secrets, password="pw", params=p, verify=True,
                      max_retries=4)
    assert res.verified == [True, True]
    got = extract_batch(res.stego, password="pw", params=p, clen_hint=4096)
    assert got == secrets
    err = res.stego.astype(np.float64) - covers.astype(np.float64)
    psnr = 10 * np.log10(255.0 ** 2 / np.mean(np.square(err)))
    assert psnr > 30.0, psnr  # imperceptibility sanity at 4KB payloads


def test_batch_embed_verify_mode(covers, monkeypatch):
    """verify=True read-back-verifies and re-salts failures until recovery."""
    p = Params(**FAST)
    secrets = [b"v0", b"v1", b"v2"]
    res = embed_batch(covers[:3], secrets, password="pw", params=p, verify=True)
    assert res.verified == [True, True, True]
    assert len(res.salts) == 3 and all(len(s) == 16 for s in res.salts)
    assert extract_batch(res.stego, password="pw", params=p) == secrets

    # Force one failure on the first read-back: the retry must re-embed that
    # image with a fresh salt and converge.
    import steganosaurus_tpu.pipeline.batch as pb

    real_extract = pb.extract_batch
    calls = {"n": 0}

    def flaky_extract(*a, **kw):
        out = real_extract(*a, **kw)
        calls["n"] += 1
        if calls["n"] == 1:
            out = list(out)
            out[1] = None
        return out

    monkeypatch.setattr(pb, "extract_batch", flaky_extract)
    fixed_salts = [bytes([i]) * 16 for i in range(3)]
    res2 = pb.embed_batch(covers[:3], secrets, password="pw", params=p,
                          salts=fixed_salts, verify=True)
    monkeypatch.undo()
    assert res2.verified == [True, True, True]
    assert res2.salts[0] == fixed_salts[0] and res2.salts[2] == fixed_salts[2]
    assert res2.salts[1] != fixed_salts[1]  # re-salted on retry
    assert extract_batch(res2.stego, password="pw", params=p) == secrets


def test_batch_matches_single_image_pipeline(covers):
    """A batch-embedded stego must decode with the single-image extractor."""
    p = Params(**FAST)
    secrets = [b"batch-vs-single"] * 2
    res = embed_batch(covers[:2], secrets, password="pw", params=p)
    for i in range(2):
        assert extract_array(res.stego[i], password="pw", params=p) == secrets[i]


def test_batch_raw_key(covers):
    p = Params(**FAST)
    mk = bytes(range(32))
    secrets = [b"k0", b"k1", b"k2"]
    res = embed_batch(covers[:3], secrets, master_key=mk, params=p)
    assert extract_batch(res.stego, master_key=mk, params=p) == secrets


def test_batch_failure_isolation(covers):
    """A corrupted image yields None without poisoning its batchmates."""
    p = Params(**FAST)
    secrets = [b"good0", b"good1", b"good2"]
    res = embed_batch(covers[:3], secrets, password="pw", params=p)
    stego = res.stego.copy()
    stego[1] = covers[3]  # not a stego image at all
    got = extract_batch(stego, password="pw", params=p)
    assert got == [b"good0", None, b"good2"]


def test_batch_clen_hint_paths(covers):
    """clen_hint fuses gathers; exact, oversized, and undersized hints all
    decode correctly (an undersized hint falls back to a second gather)."""
    p = Params(**FAST)
    secrets = [b"short", b"a much longer secret payload here", b"mid-size!"]
    res = embed_batch(covers[:3], secrets, password="pw", params=p)
    for hint in (33, 64, 2):  # exact max, oversized, undersized
        got = extract_batch(res.stego, password="pw", params=p, clen_hint=hint)
        assert got == secrets, hint


def test_batch_device_resident_roundtrip(covers):
    """Device-resident covers in, device-resident stego out, no host hop."""
    p = Params(**FAST)
    secrets = [b"dev0", b"dev1"]
    covers_d = jax.device_put(covers[:2])
    res = embed_batch(covers_d, secrets, password="pw", params=p,
                      device_resident=True)
    assert not isinstance(res.stego, np.ndarray)
    got = extract_batch(res.stego, password="pw", params=p, clen_hint=8)
    assert got == secrets
    # pulled stego matches the host-path pixels exactly
    res2 = embed_batch(covers[:2], secrets, password="pw", params=p,
                       salts=[bytes(16)] * 2)
    res3 = embed_batch(covers_d, secrets, password="pw", params=p,
                       salts=[bytes(16)] * 2, device_resident=True)
    np.testing.assert_array_equal(res2.stego, np.asarray(res3.stego))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batch_verify_mesh_retry_nondivisible(covers, monkeypatch):
    """verify=True over a mesh must survive a failed-image count that does
    not divide the mesh size (the retry re-embeds the subset unsharded)."""
    import steganosaurus_tpu.pipeline.batch as pb

    p = Params(**FAST)
    mesh = pbatch.make_mesh(8)
    imgs = np.concatenate([covers, covers[:2]], axis=0)  # B=8
    secrets = [f"vm{i}".encode() for i in range(8)]

    real_extract = pb.extract_batch
    calls = {"n": 0}

    def flaky_extract(*a, **kw):
        out = real_extract(*a, **kw)
        calls["n"] += 1
        if calls["n"] == 1:  # 3 failures: 3 does not divide 8
            out = list(out)
            for i in (1, 4, 6):
                out[i] = None
        return out

    monkeypatch.setattr(pb, "extract_batch", flaky_extract)
    res = pb.embed_batch(imgs, secrets, password="pw", params=p, mesh=mesh,
                         verify=True)
    monkeypatch.undo()
    assert res.verified == [True] * 8
    assert extract_batch(res.stego, password="pw", params=p) == secrets


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batch_sharded_over_mesh(covers):
    p = Params(**FAST)
    mesh = pbatch.make_mesh(8)
    imgs = np.concatenate([covers, covers[:2]], axis=0)  # B=8
    secrets = [f"img{i}".encode() for i in range(8)]
    res = embed_batch(imgs, secrets, password="pw", params=p, mesh=mesh)
    got = extract_batch(res.stego, password="pw", params=p, mesh=mesh)
    assert got == secrets
    # sharded and unsharded paths produce identical stego pixels
    res2 = embed_batch(imgs, secrets, password="pw", params=p,
                       salts=[bytes(16)] * 8)
    res3 = embed_batch(imgs, secrets, password="pw", params=p, mesh=mesh,
                       salts=[bytes(16)] * 8)
    np.testing.assert_array_equal(res2.stego, res3.stego)
