"""Benchmark: batched 512x512 embed+extract round-trips per second, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Comparison is apples-to-apples on the pipeline itself: both sides run in
raw-master-key mode (HKDF only — PBKDF2 is a user-tunable stretching cost
that would otherwise dominate both and measure nothing but iteration count;
the reference's own docs put it at ~99% of runtime, doc/SUMMARY.md:95).
The reference number is measured live by driving the actual C++ binary per
image (its only interface); if the binary cannot be built, falls back to the
documented ~2.0s/image FFT+walk-dominated floor.

Ours is the array-level batched device path (embed_batch/extract_batch) —
the deployment shape for bulk steganography — with payload recovery verified
every iteration.
"""

from __future__ import annotations

import base64
import json
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
REF_SRC = pathlib.Path("/root/reference/steganosaurus")
REF_BUILD = REPO / "build_ref"

SIZE = 512
BATCH = 16
SECRET_LEN = 100
ITERS = 4


def make_covers(B: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    base = np.linspace(150, 235, n)
    imgs = base[None, None, :, None] + rng.integers(-18, 19, (B, n, n, 3))
    return np.clip(imgs, 0, 255).astype(np.uint8)


def build_reference() -> pathlib.Path | None:
    exe = REF_BUILD / "turtlefft"
    if exe.exists():
        return exe
    if not REF_SRC.exists():
        return None
    try:
        REF_BUILD.mkdir(exist_ok=True)
        subprocess.run(
            ["cmake", "-S", str(REF_SRC), "-B", str(REF_BUILD), "-G", "Ninja",
             "-DCMAKE_BUILD_TYPE=Release"], check=True, capture_output=True)
        subprocess.run(["ninja", "-C", str(REF_BUILD)], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return exe if exe.exists() else None


def bench_reference(exe: pathlib.Path, cover: np.ndarray, secret: bytes,
                    key_b64: str) -> tuple[float, float] | None:
    """(Seconds per embed+extract round-trip, stego PSNR dB) via the
    reference binary — PSNR on the identical cover/secret gives the
    apples-to-apples imperceptibility baseline (the docs' '>50 dB typical'
    is for small payloads; at 100B both sides land ~42 dB)."""
    from PIL import Image

    with tempfile.TemporaryDirectory() as td:
        cp = f"{td}/cover.png"
        sp = f"{td}/stego.png"
        Image.fromarray(cover).save(cp)
        txt = secret.decode()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r1 = subprocess.run(
                [str(exe), "embed", "--in", cp, "--out", sp, "--secret", txt,
                 "--key", key_b64], capture_output=True)
            r2 = subprocess.run(
                [str(exe), "extract", "--in", sp, "--key", key_b64],
                capture_output=True)
            times.append(time.perf_counter() - t0)
            if r1.returncode or r2.returncode or txt.encode() not in r2.stdout:
                return None
        st = np.asarray(Image.open(sp)).astype(np.float64)
        mse = float(np.mean(np.square(st - cover.astype(np.float64))))
        psnr = 10.0 * np.log10(255.0 * 255.0 / mse) if mse > 0 else float("inf")
        return min(times), psnr


def bench_ours(covers: np.ndarray, secrets: list[bytes], master_key: bytes):
    """Bulk-pipeline throughput: covers device-resident (uploaded once and
    amortized, as a serving deployment would), stego stays on device between
    embed and extract; per-iteration link traffic is just the payload bit
    streams. Payload recovery is verified (AEAD tag) every iteration, and the
    stego batch is pulled once at the end for a PSNR imperceptibility check.

    Returns (images/sec, psnr_db).
    """
    import jax

    from steganosaurus_tpu.config import Params
    from steganosaurus_tpu.pipeline.batch import embed_batch, extract_batch

    p = Params()
    salts = [bytes([i]) * 16 for i in range(len(secrets))]
    covers_d = jax.device_put(covers)
    covers_d.block_until_ready()

    def step():
        res = embed_batch(covers_d, secrets, master_key=master_key, params=p,
                          salts=salts, device_resident=True)
        got = extract_batch(res.stego, master_key=master_key, params=p,
                            clen_hint=SECRET_LEN)
        assert got == secrets, "payload recovery failed"
        return res.stego

    stego_d = step()  # warmup + compile + correctness
    t0 = time.perf_counter()
    for _ in range(ITERS):
        step()
    dt = time.perf_counter() - t0

    err = np.asarray(stego_d).astype(np.float64) - covers.astype(np.float64)
    mse = float(np.mean(np.square(err)))
    psnr = 10.0 * np.log10(255.0 * 255.0 / mse) if mse > 0 else float("inf")
    return (len(secrets) * ITERS) / dt, psnr


def main():
    import jax

    from steganosaurus_tpu import runtime

    runtime.enable_compilation_cache()

    covers = make_covers(BATCH, SIZE)
    secrets = [bytes([(i + j) % 256 for j in range(SECRET_LEN)])
               for i in range(BATCH)]
    master_key = bytes(range(32))

    ours_ips, psnr = bench_ours(covers, secrets, master_key)

    exe = build_reference()
    ref = None
    if exe is not None:
        ref = bench_reference(exe, covers[0], b"A" * SECRET_LEN,
                              base64.b64encode(master_key).decode())
    measured = ref is not None
    ref_spi, ref_psnr = ref if measured else (
        2.0, None)  # documented FFT+walk floor (doc/SUMMARY.md:99-104)
    ref_ips = 1.0 / ref_spi

    print(json.dumps({
        "metric": f"embed_extract_{SIZE}px_images_per_sec",
        "value": round(ours_ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ours_ips / ref_ips, 2),
        "baseline_images_per_sec": round(ref_ips, 4),
        "baseline_measured": measured,
        "batch": BATCH,
        "secret_bytes": SECRET_LEN,
        "stego_psnr_db": round(psnr, 2),
        "stego_psnr_ref_db": round(ref_psnr, 2) if ref_psnr else None,
        "device": str(jax.devices()[0]).split(":")[0],
    }))


if __name__ == "__main__":
    sys.exit(main())
