"""Margin validation for the corner stage-2 precision modes.

One (precision mode, X0, workload) config per process invocation — the
precision mode and split band are read from env at trace time and the core
builders cache on shapes, so switching modes mid-process would silently
reuse stale HLO. Prints ONE JSON line with recovery counts, raw/post-ECC
BER, and step timing.

Workloads:
  std    — the bench's known-verified 4K noise-gradient covers (natural-
           image-like spectrum: energy concentrated at low frequencies).
  stress — adversarial covers whose spectral energy concentrates INSIDE the
           corner band but ABOVE the static split's low-x window: strong
           horizontal sinus textures at x-frequencies 100-900, a diagonal
           texture, and full-amplitude white noise. These probe the
           mix_split hazard-band assumption (corner.py _fwd_y_split): a
           column's bf16 operand-rounding error scales with that COLUMN's
           energy, while the walk-bin signal does not.

Usage:
  python scripts/validate_mix_split.py --mode mix_split --workload stress
      [--x0 64] [--batch B] [--secret-bytes 16384] [--rot 2] [--time-iters 2]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def parse():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="mix")
    ap.add_argument("--x0", type=int, default=None)
    ap.add_argument("--workload", default="std", choices=("std", "stress"))
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--secret-bytes", type=int, default=16 * 1024)
    ap.add_argument("--rot", type=int, default=0,
                    help="extra rotating-fresh-salt recovery rounds")
    ap.add_argument("--time-iters", type=int, default=2)
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu) before device use")
    ap.add_argument("--ab", default=None,
                    help="comma-separated modes for an in-process A/B "
                         "timing comparison (same tunnel window; builder "
                         "caches cleared between mode switches)")
    ap.add_argument("--ab-rounds", type=int, default=2)
    ap.add_argument("--salts", default="default",
                    choices=("default", "bench"),
                    help="'bench' uses bench.py's headline salt set")
    return ap.parse_args()


ARGS = parse()
os.environ["STEGANOSAURUS_MM_PRECISION"] = ARGS.mode
if ARGS.x0 is not None:
    os.environ["STEGANOSAURUS_SPLIT_X0"] = str(ARGS.x0)

import numpy as np  # noqa: E402

STRESS_B = 8


def stress_covers(h: int, w: int) -> np.ndarray:
    """Adversarial 4K covers (see module docstring). Disk-cached — this
    host has one CPU core."""
    path = REPO / ".cache" / f"stress_covers_{STRESS_B}x{h}x{w}.npy"
    if path.exists():
        return np.load(path)
    rng = np.random.default_rng(1234)
    xs = np.arange(w, dtype=np.float64)[None, :]
    ys = np.arange(h, dtype=np.float64)[:, None]
    imgs = []
    # 0-3: horizontal texture at x-frequency f — energy lands in corner
    # column x=f, above the static split's default X0=64 band.
    for f in (100, 300, 600, 900):
        base = 127.0 + 90.0 * np.sin(2 * np.pi * f * xs / w)
        img = base + rng.integers(-10, 11, (h, w))
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
    # 4-5: vertical texture (energy at column x~0, inside the HIGH band —
    # control case) at y-frequency f.
    for f in (100, 500):
        base = 127.0 + 90.0 * np.sin(2 * np.pi * f * ys / h)
        img = base + rng.integers(-10, 11, (h, w))
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
    # 6: diagonal texture: both axes high-frequency.
    base = 127.0 + 90.0 * np.sin(2 * np.pi * (500 * xs / w + 800 * ys / h))
    imgs.append(np.clip(base + rng.integers(-10, 11, (h, w)), 0, 255)
                .astype(np.uint8))
    # 7: full-amplitude white noise (flat spectrum).
    imgs.append(rng.integers(0, 256, (h, w), dtype=np.uint8).copy())
    out = np.stack([np.repeat(a[:, :, None], 3, axis=2) for a in imgs])
    # decorrelate the channels a little so planes differ
    out[:, :, :, 1] = np.clip(
        out[:, :, :, 1].astype(np.int16)
        + rng.integers(-6, 7, out.shape[:3]), 0, 255).astype(np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, out)
    return out


def clear_core_caches():
    """Drop every lru_cache'd core builder (they capture precision() at
    build time) so an env switch is honored by the next trace. The XLA
    persistent compile cache keys on HLO, so re-lowering a mode already
    compiled in any earlier process costs seconds, not minutes."""
    import steganosaurus_tpu.parallel.batch as pb
    import steganosaurus_tpu.pipeline.batch as pipb
    import steganosaurus_tpu.pipeline.device as pdev
    from steganosaurus_tpu.spectral import corner, fft_mxu

    for mod in (pb, pipb, pdev, corner, fft_mxu):
        for v in vars(mod).values():
            if hasattr(v, "cache_clear"):
                v.cache_clear()


def ab_compare(wl, mk, modes: list[str], rounds: int, time_iters: int):
    """Alternate modes in ONE process/window: [A B] x rounds, min over all
    timed steps per mode."""
    from steganosaurus_tpu.pipeline.batch import embed_batch, extract_batch

    best: dict[str, float] = {}
    for r in range(rounds):
        for mode in modes:
            os.environ["STEGANOSAURUS_MM_PRECISION"] = mode
            clear_core_caches()
            # warmup (compile / persistent-cache load)
            res = embed_batch(wl.covers_d, wl.secrets, master_key=mk,
                              params=wl.p, salts=wl.salts,
                              device_resident=True, layout="nchw")
            got = extract_batch(res.stego, master_key=mk, params=wl.p,
                                clen_hint=wl.secret_len, layout="nchw")
            n_ok = sum(g == s for g, s in zip(got, wl.secrets))
            for _ in range(time_iters):
                t0 = time.perf_counter()
                res = embed_batch(wl.covers_d, wl.secrets, master_key=mk,
                                  params=wl.p, salts=wl.salts,
                                  device_resident=True, layout="nchw")
                extract_batch(res.stego, master_key=mk, params=wl.p,
                              clen_hint=wl.secret_len, layout="nchw")
                dt = time.perf_counter() - t0
                best[mode] = min(best.get(mode, 1e9), dt)
            print(json.dumps({"ab_round": r, "mode": mode,
                              "recovered": n_ok,
                              "step_ms": round(best[mode] * 1000, 1)}),
                  flush=True)
    return {m: {"step_ms": round(t * 1000, 1),
                "img_per_s": round(wl.batch / t, 1)}
            for m, t in best.items()}


def main():
    import bench

    if ARGS.platform:
        import jax

        jax.config.update("jax_platforms", ARGS.platform)
    h, w = bench.UHD_H, bench.UHD_W
    mk = bytes(range(32))
    if ARGS.workload == "std":
        B = ARGS.batch or bench.UHD_BASE_BATCH
        covers = bench.uhd_headline_covers(B)
    else:
        B = ARGS.batch or STRESS_B
        covers = stress_covers(h, w)[:B]
    salts = ([bytes([i % 256, i // 256]) * 8 for i in range(B)]
             if ARGS.salts == "bench" else None)
    wl = bench.Workload(h, w, B, ARGS.secret_bytes, mk, covers=covers,
                        salts=salts)

    if ARGS.ab:
        out = ab_compare(wl, mk, ARGS.ab.split(","), ARGS.ab_rounds,
                         ARGS.time_iters)
        print(json.dumps({"ab": out, "workload": ARGS.workload,
                          "batch": B, "secret_bytes": ARGS.secret_bytes}),
              flush=True)
        return

    from steganosaurus_tpu.pipeline.batch import embed_batch, extract_batch

    rec = {"mode": ARGS.mode, "x0": ARGS.x0, "workload": ARGS.workload,
           "batch": B, "secret_bytes": ARGS.secret_bytes}
    t0 = time.perf_counter()
    res = embed_batch(wl.covers_d, wl.secrets, master_key=mk, params=wl.p,
                      salts=wl.salts, device_resident=True, layout="nchw")
    got = extract_batch(res.stego, master_key=mk, params=wl.p,
                        clen_hint=ARGS.secret_bytes, layout="nchw")
    rec["compile_plus_step_s"] = round(time.perf_counter() - t0, 2)
    rec["recovered"] = sum(g == s for g, s in zip(got, wl.secrets))
    from steganosaurus_tpu.pipeline.batch import channel_report

    ber = channel_report(res.stego, wl.secrets, wl.salts, master_key=mk,
                         params=wl.p, layout="nchw", per_image=True)
    rec["payload_ber_raw"] = round(ber["payload_ber_raw"], 7)
    rec["payload_ber_post_ecc"] = round(ber["payload_ber_post_ecc"], 7)
    rec["header_ber_raw"] = round(ber["header_ber_raw"], 7)
    rec["per_image_raw"] = [round(r["payload_ber_raw"], 6)
                            for r in ber["per_image"]]
    rec["per_image_post_ecc"] = [round(r["payload_ber_post_ecc"], 7)
                                 for r in ber["per_image"]]
    rec["per_image_ok"] = [int(g == s) for g, s in zip(got, wl.secrets)]
    # warm step timing
    times = []
    for _ in range(ARGS.time_iters):
        t0 = time.perf_counter()
        res = embed_batch(wl.covers_d, wl.secrets, master_key=mk,
                          params=wl.p, salts=wl.salts, device_resident=True,
                          layout="nchw")
        got = extract_batch(res.stego, master_key=mk, params=wl.p,
                            clen_hint=ARGS.secret_bytes, layout="nchw")
        times.append(time.perf_counter() - t0)
    if times:
        rec["step_ms"] = round(min(times) * 1000.0, 1)
        rec["img_per_s"] = round(B / min(times), 1)
    # rotating fresh salts: recovery COUNTED (walk bins are salt-independent
    # but the AEAD bits, hence written phases, rotate)
    n_ok = n_tot = 0
    for k in range(ARGS.rot):
        salts = [bytes([i % 256, 200 + k, 7]) * 5 + b"x" for i in range(B)]
        r = embed_batch(wl.covers_d, wl.secrets, master_key=mk, params=wl.p,
                        salts=salts, device_resident=True, layout="nchw")
        g = extract_batch(r.stego, master_key=mk, params=wl.p,
                          clen_hint=ARGS.secret_bytes, layout="nchw")
        n_ok += sum(x == s for x, s in zip(g, wl.secrets))
        n_tot += B
    if n_tot:
        rec["rot_recovered"] = n_ok
        rec["rot_total"] = n_tot
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
