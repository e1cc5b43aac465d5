"""Warm single-op 4K serve latency probe (doc/PAPER.md §5b; VERDICT task:
raw-tensor mode must put warm 4K embed p50 under 1 s).

Starts one serve worker (--warmup pre-compiles the 4K class), then measures
warm p50/p95 for four request classes — PNG embed, PNG extract, raw-npy
embed, raw-npy extract — with every round-trip verified (the extract's
secret must equal the embed's). Raw tensors ride /dev/shm .npy files.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
         python tools/serve_latency.py [n_per_class=9] [out.json]
"""

import base64
import json
import os
import subprocess
import sys
import time

import numpy as np

H, W = 2160, 3840
PAYLOAD = 4096


def _req(proc, obj):
    proc.stdin.write((json.dumps(obj) + "\n").encode())
    proc.stdin.flush()
    line = proc.stdout.readline()
    if not line:
        raise RuntimeError("worker died: " + proc.stderr.read().decode())
    return json.loads(line)


def main(n: int = 9, out_path: str = "/tmp/serve_latency.json") -> None:
    rng = np.random.default_rng(3)
    cover = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    secret = bytes(rng.integers(0, 256, PAYLOAD, dtype=np.uint8))
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    cover_npy = os.path.join(shm, "sl_cover.npy")
    stego_npy = os.path.join(shm, "sl_stego.npy")
    np.save(cover_npy, cover)
    cover_png = "/tmp/sl_cover.png"
    stego_png = "/tmp/sl_stego.png"
    from steganosaurus_tpu.io import image as image_io

    image_io.save_rgb(cover_png, cover)

    proc = subprocess.Popen(
        [sys.executable, "bin/turtlefft", "serve", "--pass", "pw",
         "--pbkdf2_iter", "5000", "--warmup", f"{H}x{W}:{PAYLOAD}"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, cwd="/root/repo")
    try:
        assert _req(proc, {"op": "ping"})["ok"]
        sb64 = base64.b64encode(secret).decode()
        lat = {k: [] for k in ("embed_png", "extract_png",
                               "embed_raw", "extract_raw")}
        # one unmeasured warm pass per class (absorbs any residual compile)
        for _ in range(2):
            r = _req(proc, {"op": "embed", "in": cover_png,
                            "out": stego_png, "secret_b64": sb64})
            assert r["ok"], r
            r = _req(proc, {"op": "extract", "in": stego_png})
            assert r["ok"] and r["secret_b64"] == sb64, r
            r = _req(proc, {"op": "embed", "in_npy": cover_npy,
                            "out_npy": stego_npy, "secret_b64": sb64})
            assert r["ok"], r
            r = _req(proc, {"op": "extract", "in_npy": stego_npy})
            assert r["ok"] and r["secret_b64"] == sb64, r
        for i in range(n):
            t0 = time.time()
            r = _req(proc, {"op": "embed", "in": cover_png,
                            "out": stego_png, "secret_b64": sb64})
            lat["embed_png"].append(time.time() - t0)
            assert r["ok"], r
            t0 = time.time()
            r = _req(proc, {"op": "extract", "in": stego_png})
            lat["extract_png"].append(time.time() - t0)
            assert r["ok"] and r["secret_b64"] == sb64, r
            t0 = time.time()
            r = _req(proc, {"op": "embed", "in_npy": cover_npy,
                            "out_npy": stego_npy, "secret_b64": sb64})
            lat["embed_raw"].append(time.time() - t0)
            assert r["ok"], r
            t0 = time.time()
            r = _req(proc, {"op": "extract", "in_npy": stego_npy})
            lat["extract_raw"].append(time.time() - t0)
            assert r["ok"] and r["secret_b64"] == sb64, r
            print(f"round {i}: " + " ".join(
                f"{k}={lat[k][-1]:.2f}s" for k in lat), flush=True)
        stats = _req(proc, {"op": "stats"})
        _req(proc, {"op": "shutdown"})
        out = {"hw": [H, W], "payload": PAYLOAD, "n": n,
               "roundtrips_verified": True,
               "worker_stats": stats.get("ops"),
               "client": {k: {"p50": float(np.percentile(v, 50)),
                              "p95": float(np.percentile(v, 95)),
                              "min": float(min(v))}
                          for k, v in lat.items()}}
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out["client"], indent=1))
        print("wrote", out_path)
    finally:
        proc.kill()


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 9, *(a[1:] or []))
