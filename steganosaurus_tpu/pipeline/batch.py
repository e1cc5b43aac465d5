"""Batched embed/extract over a device mesh (the throughput path).

The reference processes one image per process invocation (~6 s, KDF-bound).
The TPU-native bulk path amortizes everything:

- host: AEAD/KDF/ECC per image (C++ crypto), ONE turtle expansion for the
  whole batch — the walk key is salt-independent (steganosaur.cpp:1134-1143),
  so with a shared password/master key every image follows the same bin
  sequence; only the bit values differ.
- link: images cross host<->device exactly once per direction, as uint8 in
  native (B, H, W, 3) layout; the shared (nbits,) index arrays upload once
  per batch, not per image. (The host link, not the MXU, bounds throughput.)
- device: one traced graph per (H, W) bucket — u8 decode -> pad -> FFT ->
  median -> phase scatter -> IFFT -> quantize — vmapped over the batch and
  sharded over the mesh "batch" axis with no steady-state collectives
  (SURVEY.md §2.3). Extraction FFTs each image once: the spectrum stays
  device-resident between the header and payload gather passes.

Ragged payloads: shorter frames repeat their last bit into the shared walk's
surplus bins; bins past an image's own frame are never read back (clen bounds
the read), so the padding is invisible to extraction — including extraction
by the reference binary.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from steganosaurus_tpu import crypto, keystream, spectral
from steganosaurus_tpu.config import Params
from steganosaurus_tpu.ops import bits as bit_ops
from steganosaurus_tpu.ops import ecc
from steganosaurus_tpu.parallel import batch as pbatch
from steganosaurus_tpu.parallel import transfer
from steganosaurus_tpu.pipeline import header as header_mod
from steganosaurus_tpu.pipeline.errors import StegoError
from steganosaurus_tpu.pipeline.header import Header

_HEADER_STREAM_BITS = header_mod.FIXED_LEN * 8 * 3


@dataclass
class BatchEmbedResult:
    stego: np.ndarray            # (B, H, W, 3) uint8 (jax array if device_resident)
    written_bits: list[int]
    payload_bytes: list[int]


def _walk_indices(password, master_key, params, PH, PW, nbits,
                  allow_short=False):
    path_key = crypto.derive_path_key(password, master_key, None)
    key_walk, key_r, key_g, key_b = crypto.derive_turtle_keys(path_key)
    return keystream.turtle_expand(
        key_walk, (key_r, key_g, key_b), PH, PW,
        params.rmin, params.rmax, params.density, params.jitter, nbits,
        allow_short=allow_short,
    )


def embed_batch(
    imgs: np.ndarray,
    secrets: list[bytes],
    password: str | None = None,
    master_key: bytes | None = None,
    params: Params = Params(),
    salts: list[bytes] | None = None,
    mesh=None,
    device_resident: bool = False,
) -> BatchEmbedResult:
    """Embed `secrets[i]` into `imgs[i]` under one shared password/master key.

    imgs: (B, H, W, 3) uint8 — numpy, or an already-device-resident jax array
    (amortize the upload across calls by `jax.device_put`-ing covers once).
    cover_dependent_path is not supported on the batch path (the walk would
    differ per image; use embed_array).

    device_resident=True returns the stego batch as a device u8 array (no
    host pull) — feed it straight to extract_batch or pull it later; the
    host<->device link is the bulk path's bottleneck, not compute.
    """
    if (password is None) == (master_key is None):
        raise ValueError("exactly one of password/master_key required")
    if params.cover_dependent_path:
        raise StegoError("cover_dependent_path is per-image; use embed_array")
    B, H, W = imgs.shape[:3]
    assert len(secrets) == B
    PH, PW = spectral.fft_dims(H, W)

    if salts is None:
        salts = [crypto.get_random_bytes(16) for _ in range(B)]

    # Host crypto per image -> ECC bit frames
    frames = []
    for secret, salt in zip(secrets, salts):
        if master_key is not None:
            km = crypto.derive_keys_from_raw(master_key, salt)
        else:
            km = crypto.derive_keys(password, salt, params.pbkdf2_iter)
        hdr_bytes = Header(salt=km.salt, nonce=km.nonce, clen=len(secret)).to_bytes()
        ct, tag = crypto.aead_seal(km.aead_key, km.nonce, hdr_bytes, secret)
        h = ecc.rep3_encode(bit_ops.bits_from_bytes(hdr_bytes))
        p = ecc.rep7_encode(bit_ops.bits_from_bytes(ct + tag))
        frames.append(np.concatenate([np.asarray(h), np.asarray(p)]))

    nmax = max(len(f) for f in frames)
    # One walk serves the whole batch (salt-independent path key)
    plane, y, x, jit = _walk_indices(password, master_key, params, PH, PW, nmax)

    bits = np.zeros((B, nmax), np.uint8)
    for i, f in enumerate(frames):
        bits[i, : len(f)] = f
        bits[i, len(f):] = f[-1]  # surplus bins: repeat; never read back

    fn = pbatch.batched_embed_core(H, W, params.center, params.adaptive_alpha,
                                   mesh, pack=not device_resident)
    if mesh is not None and not isinstance(imgs, jnp.ndarray):
        imgs_d = pbatch.shard_batch(np.ascontiguousarray(imgs), mesh)
        bits_d = pbatch.shard_batch(bits, mesh)
    else:
        imgs_d = imgs if isinstance(imgs, jnp.ndarray) else np.ascontiguousarray(imgs)
        bits_d = bits
    out = fn(imgs_d, plane, y, x, bits_d, jit, jnp.float32(params.alpha))
    if device_resident:
        stego = out
    else:
        stego = transfer.unpack_u8(np.asarray(out), (B, H, W, 3))
    return BatchEmbedResult(
        stego=stego,
        written_bits=[len(f) for f in frames],
        payload_bytes=[len(s) for s in secrets],
    )


def extract_batch(
    imgs: np.ndarray,
    password: str | None = None,
    master_key: bytes | None = None,
    params: Params = Params(),
    mesh=None,
    clen_hint: int | None = None,
) -> list[bytes | None]:
    """Extract secrets from a batch of stego images (shared key).

    Returns one bytes per image, or None where extraction failed (bad magic /
    truncated / auth failure) — batch semantics must not abort the whole batch
    on one bad image.

    clen_hint: expected ciphertext length (= secret length) in bytes. When
    given, the header and payload bins are gathered in ONE device pass —
    halving the host<->device round-trips, which dominate extract latency on
    high-RTT links. Images whose actual header clen exceeds the hint fall
    back to a second gather; a wrong hint never misdecodes (clen is read
    from the authenticated header either way).
    """
    if (password is None) == (master_key is None):
        raise ValueError("exactly one of password/master_key required")
    if params.cover_dependent_path:
        raise StegoError("cover_dependent_path is per-image; use extract_array")
    B, H, W = imgs.shape[:3]
    PH, PW = spectral.fft_dims(H, W)

    analyze = pbatch.batched_analyze_core(H, W, params.center, mesh)
    gather = pbatch.batched_gather_bits_core(params.adaptive_alpha, mesh)
    if isinstance(imgs, jnp.ndarray):
        imgs_d = imgs  # already device-resident (e.g. embed's output)
    elif mesh is not None:
        imgs_d = pbatch.shard_batch(np.ascontiguousarray(imgs), mesh)
    else:
        imgs_d = np.ascontiguousarray(imgs)
    spec, med = analyze(imgs_d)  # device-resident; one FFT per image total

    alpha = jnp.float32(params.alpha)

    # Walk capacity upper bound: each accepted bit marks a bin + its
    # conjugate, so no image can carry more than this many bits. Bounds both
    # the gather size under a corrupt header clen (the reference hangs here,
    # doc/TESTING.md:151-156) and oversized clen_hints.
    cap_bits = 3 * PH * PW // 2

    def gather_stream(nbits: int, skip: int = 0) -> np.ndarray:
        """One device gather of walk bits [skip, nbits), bucketed to reuse
        compiled graphs across nearby sizes. Bits past walk exhaustion are
        garbage (last-bin re-reads) — callers only consume bits their
        authenticated clen covers, or fail AEAD."""
        bucket = -(-(nbits - skip) // 4096) * 4096
        plane, y, x, jit, _ = _walk_indices(password, master_key, params, PH,
                                            PW, nbits, allow_short=True)
        pad = bucket - (nbits - skip)
        sl = slice(skip, nbits)
        pl, yy, xx, jj = (np.concatenate([a[sl], np.repeat(a[nbits - 1], pad)])
                          for a in (plane, y, x, jit))
        out = np.asarray(gather(spec, med, pl, yy, xx, jj, alpha))
        return out[:, : nbits - skip]

    def parse_headers(hdr_streams: np.ndarray) -> list[Header | None]:
        headers: list[Header | None] = []
        for i in range(B):
            hb = bit_ops.bytes_from_bits(
                np.asarray(ecc.rep3_decode(hdr_streams[i]))
            )
            if hb[:4] != header_mod.MAGIC or hb[4] != header_mod.VERSION:
                headers.append(None)
            else:
                headers.append(Header.from_bytes(hb))
        return headers

    if clen_hint is not None:
        # fused pass: header + hinted payload in one gather (one link RTT)
        hint_bits = min((clen_hint + 16) * 8 * 7, cap_bits)
        streams = gather_stream(_HEADER_STREAM_BITS + hint_bits)
        headers = parse_headers(streams[:, :_HEADER_STREAM_BITS])
        clens = [h.clen for h in headers if h is not None]
        if not clens:
            return [None] * B
        need = min((max(clens) + 16) * 8 * 7, cap_bits)
        if need <= hint_bits:
            payload_streams = streams[:, _HEADER_STREAM_BITS:]
        else:  # hint too small for some image: re-gather the full payload
            payload_streams = gather_stream(
                _HEADER_STREAM_BITS + need, skip=_HEADER_STREAM_BITS
            )
    else:
        # pass 1: headers (identical walk prefix for every image)
        headers = parse_headers(gather_stream(_HEADER_STREAM_BITS))
        clens = [h.clen for h in headers if h is not None]
        if not clens:
            return [None] * B
        # pass 2: payloads up to the largest clen in the batch (spectrum
        # stays device-resident between the passes). cap_bits bounds the
        # gather so a corrupt decoded clen cannot blow up memory; images
        # claiming more than capacity simply fail AEAD -> None.
        need = min((max(clens) + 16) * 8 * 7, cap_bits)
        payload_streams = gather_stream(
            _HEADER_STREAM_BITS + need, skip=_HEADER_STREAM_BITS
        )

    out: list[bytes | None] = []
    for i, hdr in enumerate(headers):
        if hdr is None:
            out.append(None)
            continue
        nbits = (hdr.clen + 16) * 8 * 7
        if nbits > payload_streams.shape[1]:  # clen beyond walk capacity
            out.append(None)
            continue
        pb = np.asarray(ecc.rep7_decode(payload_streams[i, :nbits]))
        rest = bit_ops.bytes_from_bits(pb)
        if len(rest) < hdr.clen + 16:
            out.append(None)
            continue
        ct, tag = rest[: hdr.clen], rest[hdr.clen : hdr.clen + 16]
        if master_key is not None:
            km = crypto.derive_keys_from_raw(master_key, hdr.salt)
        else:
            km = crypto.derive_keys(password, hdr.salt, params.pbkdf2_iter)
        hdr_bytes = hdr.to_bytes()
        out.append(crypto.aead_open(km.aead_key, km.nonce, hdr_bytes, ct, tag))
    return out
