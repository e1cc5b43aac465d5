"""Benchmark: batched 4K-UHD embed+extract round-trips per second, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric (BASELINE.json north star): 4K UHD (2160x3840) batched
embed+extract with 16 KB payloads, payload recovery verified (AEAD tag)
every iteration. A 512px/100B secondary metric is included for continuity
with earlier rounds.

Baseline: the reference C++ binary CANNOT round-trip 4K UHD at all — it
pads to pow2 and crops the IFFT, which corrupts the written phases on every
non-pow2 image ("Magic not found", verified directly; see spectral.fft_dims).
The honest baseline is therefore the largest image class it CAN round-trip:
4096x4096 (pow2, 2x the UHD pixel count), measured live once and cached in
.cache/bench_baseline.json (a round-trip takes ~3 min). Comparison is
apples-to-apples on the pipeline itself: both sides run raw-master-key mode
(PBKDF2 is a user-tunable stretching cost; the reference's own docs put it
at ~99% of runtime, doc/SUMMARY.md:95).
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
BASELINE_CACHE = REPO / ".cache" / "bench_baseline.json"

# Headline config: 4K UHD, 16 KB payloads (BASELINE.json config 3).
# Batch 32: per-batch dispatch/launch overhead amortizes over 2x images vs
# batch 16 (152 vs 111 img/s serialized loop, measured); all 32 fixed
# (cover, salt) pairs verify recovery.
UHD_H, UHD_W = 2160, 3840
UHD_BATCH = 32
UHD_SECRET = 16 * 1024
UHD_ITERS = 3

# Secondary config (continuity with earlier rounds)
SMALL = 512
SMALL_BATCH = 16
SMALL_SECRET = 100
SMALL_ITERS = 4

# Tertiary: BASELINE config 2 (1080p, multi-KB payloads)
FHD_H, FHD_W = 1080, 1920
FHD_BATCH = 32
FHD_SECRET = 4 * 1024
FHD_ITERS = 3

# Same-workload baseline comparison: 4096^2 pow2, the largest class the
# reference can round-trip, at the same 2 KB payload its baseline
# measurement uses — vs_baseline_same_size divides like for like.
P2_N = 4096
P2_BATCH = 8
P2_SECRET = 2000
P2_ITERS = 2


def make_covers(B: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    base = np.linspace(150, 235, w)
    imgs = base[None, None, :, None] + rng.integers(-18, 19, (B, h, w, 3))
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
                    key_b64: str, reps: int = 3) -> tuple[float, float] | None:
    """(Seconds per embed+extract round-trip, stego PSNR dB) via the
    reference binary on the given cover."""
    from PIL import Image

    with tempfile.TemporaryDirectory() as td:
        cp = f"{td}/cover.png"
        sp = f"{td}/stego.png"
        Image.fromarray(cover).save(cp)
        txt = secret.decode()
        times = []
        for _ in range(reps):
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


def reference_baselines(exe: pathlib.Path | None, key_b64: str) -> dict:
    """Measured reference numbers, cached on disk (the 4096^2 round-trip
    alone takes ~3 minutes of single-core C++)."""
    if BASELINE_CACHE.exists():
        try:
            cached = json.loads(BASELINE_CACHE.read_text())
            # Serve only successful measurements: older bench versions cached
            # measured:false entries (with invented floors); honoring those
            # would suppress re-measurement forever on hosts where the
            # reference now builds.
            if cached.get("measured"):
                return cached
        except json.JSONDecodeError:
            pass
    out = {"measured": False}
    if exe is not None:
        small = bench_reference(exe, make_covers(1, SMALL, SMALL)[0],
                                b"A" * SMALL_SECRET, key_b64, reps=3)
        big = bench_reference(exe, make_covers(1, 4096, 4096)[0],
                              b"A" * 2000, key_b64, reps=1)
        if small and big:
            out = {
                "measured": True,
                "spi_512": small[0], "psnr_512": small[1],
                "spi_4096": big[0], "psnr_4096": big[1],
            }
    if not out["measured"]:
        # No invented numbers: a guessed baseline in the headline
        # vs_baseline ratio is worse than no ratio. Callers must handle None.
        out.update({"spi_512": None, "psnr_512": None, "spi_4096": None,
                    "psnr_4096": None})
        return out  # don't cache a failure; retry next run
    BASELINE_CACHE.parent.mkdir(parents=True, exist_ok=True)
    BASELINE_CACHE.write_text(json.dumps(out))
    return out


def bench_ours(h: int, w: int, batch: int, secret_len: int, iters: int,
               master_key: bytes):
    """Bulk-pipeline throughput: covers device-resident (uploaded once and
    amortized, as a serving deployment would), stego stays on device between
    embed and extract. Payload recovery is verified (AEAD tag) every
    iteration; the stego batch is pulled once at the end for PSNR.

    Returns (loop_ips, psnr_db, ssim, ber_dict, stream_ips); stream_ips
    (the pipelined serving path) is the headline.
    """
    import jax
    import jax.numpy as jnp

    from steganosaurus_tpu.config import Params
    from steganosaurus_tpu.pipeline.batch import embed_batch, extract_batch

    rng = np.random.default_rng(7)
    covers = make_covers(batch, h, w)
    secrets = [bytes(rng.integers(0, 256, secret_len, dtype=np.uint8))
               for _ in range(batch)]
    p = Params()
    salts = [bytes([i]) * 16 for i in range(batch)]
    # Serving layout: covers live on device in (B, 3, H, W) — layout="nchw"
    # skips two strided u8 relayouts per round-trip (the one-time transpose
    # below is paid at ingest, exactly like a production pipeline would).
    covers_d = jax.jit(lambda a: jnp.transpose(a, (0, 3, 1, 2)))(
        jax.device_put(covers))
    covers_d.block_until_ready()

    def step():
        res = embed_batch(covers_d, secrets, master_key=master_key, params=p,
                          salts=salts, device_resident=True, layout="nchw")
        got = extract_batch(res.stego, master_key=master_key, params=p,
                            clen_hint=secret_len, layout="nchw")
        assert got == secrets, "payload recovery failed"
        return res.stego

    stego_d = step()  # warmup + compile + correctness

    # HEADLINE: the pipelined serving path (pipeline.stream) — batch N+1's
    # host AEAD/packing and dispatch overlap batch N's device graphs
    # (embed_stream chained into extract_stream, depth-2 in flight), which
    # both hides host time and absorbs the tunneled runtime's per-pull
    # latency jitter (the serialized loop below eats every stall at full
    # price; production bulk pipelines are stream-shaped).
    from steganosaurus_tpu.pipeline import stream as pstream

    t0 = time.perf_counter()
    embeds = pstream.embed_stream(
        ((covers_d, secrets, salts) for _ in range(iters)),
        master_key=master_key, params=p, depth=2, layout="nchw")
    for got in pstream.extract_stream((r.stego for r in embeds),
                                      master_key=master_key, params=p,
                                      clen_hint=secret_len, depth=2,
                                      layout="nchw"):
        assert got == secrets, "payload recovery failed (streamed)"
    stream_dt = time.perf_counter() - t0

    # Secondary: strictly serialized embed->extract->pull round-trip loop
    # (latency-shaped: every dispatch gap and tunnel stall lands on the
    # critical path).
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0

    from steganosaurus_tpu.pipeline.batch import channel_report
    from steganosaurus_tpu.utils import metrics

    # Channel quality (SURVEY §5: BER before/after ECC) — measured once on
    # the final stego batch, outside the timed loop.
    ber = channel_report(stego_d, secrets, salts, master_key=master_key,
                         params=p, layout="nchw")

    stego = np.asarray(stego_d).transpose(0, 2, 3, 1)
    err = stego.astype(np.float64) - covers.astype(np.float64)
    mse = float(np.mean(np.square(err)))
    psnr = 10.0 * np.log10(255.0 * 255.0 / mse) if mse > 0 else float("inf")
    ssim = float(np.mean([metrics.ssim(covers[i], stego[i])
                          for i in range(min(batch, 4))]))
    return ((batch * iters) / dt, psnr, ssim, ber,
            (batch * iters) / stream_dt)


def psnr_target_config(master_key: bytes) -> dict | None:
    """Find a 4K UHD config meeting the BASELINE imperceptibility bar
    (PSNR > 50 dB, SSIM > 0.995) with AEAD-verified recovery (verify mode
    re-salts failures, so recovery is deterministic when it converges).

    The headline 16KB config trades imperceptibility for payload density;
    this ladder walks the payload down until the bar is met and reports the
    winning config. Payload size is the lever: the write sets a bin's phase
    to +-alpha regardless of its current (uniform) phase, so the per-bin
    delta is ~mag*O(1) INDEPENDENT of alpha — PSNR moves ~6 dB per payload
    halving and essentially not at all with alpha (measured). Alpha stays at
    the default 0.5 for full noise margin.
    """
    from steganosaurus_tpu.config import Params
    from steganosaurus_tpu.pipeline.batch import embed_batch
    from steganosaurus_tpu.utils import metrics

    rng = np.random.default_rng(13)
    B = 4
    covers = make_covers(B, UHD_H, UHD_W)
    import jax

    covers_d = jax.device_put(covers)
    for alpha, nbytes in ((0.5, 2048), (0.5, 1024), (0.5, 512)):
        p = Params(alpha=alpha)
        secrets = [bytes(rng.integers(0, 256, nbytes, dtype=np.uint8))
                   for _ in range(B)]
        res = embed_batch(covers_d, secrets, master_key=master_key, params=p,
                          device_resident=True, verify=True, max_retries=4)
        if not all(res.verified):
            continue
        stego = np.asarray(res.stego)
        err = stego.astype(np.float64) - covers.astype(np.float64)
        psnr = 10.0 * np.log10(255.0 ** 2 / float(np.mean(np.square(err))))
        ssim = float(np.mean([metrics.ssim(covers[i], stego[i])
                              for i in range(B)]))
        if psnr > 50.0 and ssim > 0.995:
            return {"alpha": alpha, "secret_bytes": nbytes,
                    "psnr_db": round(psnr, 2), "ssim": round(ssim, 4),
                    "recovery_verified": True}
    return None


def main():
    import jax

    from steganosaurus_tpu import _native_loader, runtime

    runtime.enable_compilation_cache()
    # The C++ walk expander is a build artifact; without it the fresh-key
    # turtle expansion silently runs in pure Python (~1000x slower) and
    # poisons the first measured step.
    _native_loader.ensure_built()
    master_key = bytes(range(32))
    key_b64 = base64.b64encode(master_key).decode()

    uhd_loop_ips, uhd_psnr, uhd_ssim, uhd_ber, uhd_ips = bench_ours(
        UHD_H, UHD_W, UHD_BATCH, UHD_SECRET, UHD_ITERS, master_key)
    _, fhd_psnr, _, _, fhd_ips = bench_ours(
        FHD_H, FHD_W, FHD_BATCH, FHD_SECRET, FHD_ITERS, master_key)
    _, _, _, _, p2_ips = bench_ours(
        P2_N, P2_N, P2_BATCH, P2_SECRET, P2_ITERS, master_key)
    # 512px secondary keeps the serialized-loop semantic (continuity with
    # earlier rounds; at 0.3 ms/img of device work the stream's per-batch
    # yield overhead dominates and the loop is the better number).
    small_ips, small_psnr, small_ssim, _, _ = bench_ours(
        SMALL, SMALL, SMALL_BATCH, SMALL_SECRET, SMALL_ITERS, master_key)
    target_cfg = psnr_target_config(master_key)

    ref = reference_baselines(build_reference(), key_b64)
    ref_4096_ips = (1.0 / ref["spi_4096"]) if ref["measured"] else None

    print(json.dumps({
        "metric": "embed_extract_4k_uhd_images_per_sec",
        "value": round(uhd_ips, 3),
        # Baseline: reference at 4096^2 pow2, its largest working class —
        # it cannot round-trip 4K UHD (non-pow2) at all. vs_baseline is null
        # if the reference build/measure failed (no invented numbers).
        "unit": "images/sec/chip",
        "vs_baseline": (round(uhd_ips / ref_4096_ips, 1)
                        if ref_4096_ips else None),
        "baseline_4096px_images_per_sec": (round(ref_4096_ips, 5)
                                           if ref_4096_ips else None),
        "baseline_4k_uhd": "fails: reference cannot round-trip non-pow2 "
                           "images (pad+crop corrupts phases)",
        "baseline_measured": ref["measured"],
        "batch": UHD_BATCH,
        "secret_bytes": UHD_SECRET,
        "stego_psnr_db": round(uhd_psnr, 2),
        "stego_ssim": round(uhd_ssim, 4),
        # strictly serialized per-batch round-trip loop (latency-shaped;
        # the headline is the pipelined stream — see bench_ours)
        "loop_images_per_sec": round(uhd_loop_ips, 3),
        "payload_ber_raw": round(uhd_ber["payload_ber_raw"], 6),
        "payload_ber_post_ecc": round(uhd_ber["payload_ber_post_ecc"], 6),
        "header_ber_raw": round(uhd_ber["header_ber_raw"], 6),
        # 4K config meeting PSNR>50dB / SSIM>0.995 with verified recovery
        "psnr_target_config": target_cfg,
        # identical workload to the reference baseline (4096^2 pow2, 2 KB)
        "pow2_4096_images_per_sec": round(p2_ips, 3),
        "vs_baseline_same_size": (round(p2_ips / ref_4096_ips, 1)
                                  if ref_4096_ips else None),
        "fhd_1080p_images_per_sec": round(fhd_ips, 3),
        "fhd_1080p_psnr_db": round(fhd_psnr, 2),
        "secondary_512px_images_per_sec": round(small_ips, 3),
        "secondary_512px_vs_baseline": (round(small_ips * ref["spi_512"], 2)
                                        if ref["measured"] else None),
        "secondary_512px_psnr_db": round(small_psnr, 2),
        "secondary_512px_ssim": round(small_ssim, 4),
        "ref_psnr_512_db": (round(ref["psnr_512"], 2)
                            if ref.get("psnr_512") else None),
        "device": str(jax.devices()[0]).split(":")[0],
    }))


def main_with_retry():
    """The tunneled device occasionally throws transient RESOURCE_EXHAUSTED /
    stalls (see .claude/skills/verify gotchas); one retry rides it out."""
    try:
        return main()
    except Exception as e:  # noqa: BLE001 - deliberate broad retry
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); "
              f"retrying once...", file=sys.stderr)
        time.sleep(20)
        return main()


if __name__ == "__main__":
    sys.exit(main_with_retry())
