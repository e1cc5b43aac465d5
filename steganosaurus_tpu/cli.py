"""`turtlefft` CLI — flag- and output-compatible with the reference binary
(steganosaur.cpp:813-877 usage/args, :1107-1108/:1311/:1329-1331 outputs),
so the reference shell suites (test_hardening.sh, test_kdf_timing.sh) drive it
unchanged.

Modes: gen-key | embed | extract.
"""

from __future__ import annotations

import sys

from steganosaurus_tpu import crypto
from steganosaurus_tpu.config import Params
from steganosaurus_tpu.crypto import keywrap
from steganosaurus_tpu.pipeline.errors import StegoError

USAGE = """Usage:
  Key Gen: turtlefft gen-key [--key-out FILE] [--wrap-pass PW]
            Generate a new 256-bit master key, print base64 + fingerprint.
            If --key-out is given, export (optionally passphrase-wrapped) key to file.

  Embed  : turtlefft embed   --in host.png --out stego.png --secret TEXT
            (--pass PW | --key KEY_BASE64)
            [--alpha 0.22 --jitter 0.05 --density 0.7 --rmin 0.05 --rmax 0.45 --magmin 0.01 --center 0]
            [--pbkdf2_iter 600000 --adaptive_alpha 1 --cover_dependent_path 1]

  Extract: turtlefft extract --in stego.png (--pass PW | --key KEY_BASE64)
            [--pbkdf2_iter 600000 --adaptive_alpha 1 --cover_dependent_path 1]

  Check  : turtlefft check   --in host.png --secret TEXT
            (--pass PW | --key KEY_BASE64) [flags]
            Dry run (nothing written): capacity, PSNR/SSIM, warden-view
            phase statistics vs the clean cover, round-trip verify.

  Batch  : turtlefft batch-embed   --in-dir D --out-dir D2 --secrets-file F
            (--pass PW | --key KEY_BASE64) [--verify 1] [flags]
            F holds one secret per line, paired with the sorted *.png files
            in --in-dir; same-size covers are embedded as one device batch.
           turtlefft batch-extract --in-dir D (--pass PW | --key KEY_BASE64)
            [flags]  — prints "filename<TAB>secret" per image ("<FAILED>"
            for images that do not authenticate).

  Serve  : turtlefft serve (--pass PW | --key KEY_BASE64) [flags]
            [--warmup HxW[:PAYLOAD_BYTES] ...]
            Long-running steady-state worker: JSON-lines requests on stdin
            (ping/embed/extract/embed_batch/extract_batch/shutdown), one
            JSON response per line on stdout. Key and flags are fixed for
            the worker's lifetime — compiled modules, walk expansions, and
            derived keys stay warm across requests. --warmup (repeatable)
            pre-compiles the given serving classes (image shape + typical
            payload size) before the ready line, so the first real request
            skips the jit compile. Single extracts ride a fused one-pass
            device read sized by the last seen payload (or an explicit
            per-request "clen_hint"), falling back to the two-pass path on
            a stale hint.

  Key options:
    --pass PW              : Use passphrase (derives key via PBKDF2+HKDF)
    --key KEY_BASE64       : Use raw 32-byte key (base64 encoded)
    --key-out FILE         : Export generated key to file
    --wrap-pass PW         : Wrap exported key with passphrase (ChaCha20-Poly1305)

  Hardening features (default enabled):
    --pbkdf2_iter N        : PBKDF2 iterations (default: 600000 for >100ms)
    --adaptive_alpha 0|1   : Adaptive phase shift per bin (default: 0)
    --cover_dependent_path 0|1 : Cover-dependent turtlewalk (default: 0)
    --soft_write 0|1       : Minimal-energy phase write (+3-5 dB PSNR,
                             rebuild-only; reference still extracts) (0)
    --alpha_spread S       : Keyed per-bin randomized write amplitude in
                             [alpha, alpha(1+S)) — flattens the phase
                             histogram, margin never below alpha
                             (rebuild-only; extraction unchanged,
                             reference still extracts) (0.0)
    --per_image_walk 0|1   : Salt-keyed per-image payload walks — defeats
                             cross-image residual averaging under one key
                             (rebuild-only wire format, header flag 0x01;
                             extraction auto-detects it) (0)
    --qim L                : Dithered phase QIM for the payload at level L
                             (step 2*pi/L; margin pi/(2L), L=3 ~ alpha=0.5)
                             — written-bin phases become marginally UNIFORM
                             (no histogram signature) at ~9x less write
                             energy than the hard write (rebuild-only wire
                             format, header FLAGS bits 4-7; extraction
                             auto-detects; the reference binary fails
                             closed) (0 = off)
    --rs 0|1               : Interleaved Reed-Solomon RS(255,223) payload
                             FEC instead of Rep-7 — 1.14x expansion vs 7x,
                             ~6x more capacity per image (rebuild-only wire
                             format, header flag 0x02; extraction
                             auto-detects; the reference binary fails
                             closed) (0)
    --coherent 0|1         : Channel-coherent payload write — each payload
                             bit rotates ALL THREE planes at its site by
                             one common phase delta (bit lives in the
                             common-mode phase), preserving every pairwise
                             R/G/B phase difference exactly: blinds the
                             cross-channel correlation warden on
                             photographic covers at ~3x write energy and
                             ~1/3 capacity (rebuild-only wire format,
                             header flag 0x08; extraction auto-detects;
                             the reference binary fails closed) (0)
    --pad Q                : Pad the plaintext to the next Q-byte multiple
                             before sealing (BE32 length prefix + keyed
                             pad) so the embedded footprint quantizes to
                             Q-byte buckets instead of leaking the exact
                             message length (rebuild-only wire format,
                             header flag 0x04; extraction auto-detects)
                             (0 = off)
    --soft_decode 0|1      : Soft-decision recovery fallback on extraction
                             (matched-filter combining of ECC copies after
                             an AEAD failure; recovers margin failures the
                             reference cannot) (1)
    --stealth 0|1          : Recommended stealth preset — jitter pi/8 +
                             one-sided amplitude spread + soft write +
                             per-image walks (Params.stealth; explicit
                             flags override; extract needs the same
                             --jitter or --stealth) (0)
"""


class Args:
    def __init__(self):
        self.mode = ""
        self.in_path = ""
        self.out_path = ""
        self.secret = ""
        self.password = ""
        self.key_b64 = ""
        self.key_out = ""
        self.wrap_pass = ""
        self.in_dir = ""
        self.out_dir = ""
        self.secrets_file = ""
        self.verify = False
        self.warmup: list[tuple[int, int]] = []
        self.params = Params()


def parse_args(argv: list[str]) -> Args | None:
    """Mirror of reference parse_args (steganosaur.cpp:846-877)."""
    if len(argv) < 2:
        return None
    a = Args()
    a.mode = argv[1]
    p = {}
    stealth = False
    i = 2
    while i < len(argv):
        k = argv[i]

        def need():
            nonlocal i
            i += 1
            return argv[i] if i < len(argv) else ""

        if k == "--in":
            a.in_path = need()
        elif k == "--out":
            a.out_path = need()
        elif k == "--secret":
            a.secret = need()
        elif k == "--pass":
            a.password = need()
        elif k == "--key":
            a.key_b64 = need()
        elif k == "--key-out":
            a.key_out = need()
        elif k == "--wrap-pass":
            a.wrap_pass = need()
        elif k == "--alpha":
            p["alpha"] = float(need())
        elif k == "--jitter":
            p["jitter"] = float(need())
        elif k == "--density":
            p["density"] = float(need())
        elif k == "--rmin":
            p["rmin"] = float(need())
        elif k == "--rmax":
            p["rmax"] = float(need())
        elif k == "--magmin":
            p["magmin"] = float(need())
        elif k == "--center":
            p["center"] = need() in ("1", "true")
        elif k == "--pbkdf2_iter":
            p["pbkdf2_iter"] = int(need())
        elif k == "--adaptive_alpha":
            p["adaptive_alpha"] = need() in ("1", "true")
        elif k == "--cover_dependent_path":
            p["cover_dependent_path"] = need() in ("1", "true")
        elif k == "--fft_dtype":  # rebuild-only: complex64|complex128
            p["fft_dtype"] = need()
        elif k == "--soft_write":  # rebuild-only: minimal-energy write
            p["soft_write"] = need() in ("1", "true")
        elif k == "--alpha_spread":  # rebuild-only: randomized amplitude
            p["alpha_spread"] = float(need())
        elif k == "--per_image_walk":  # rebuild-only: salt-keyed walks
            p["per_image_walk"] = need() in ("1", "true")
        elif k == "--qim":  # rebuild-only: dithered phase QIM payload write
            p["qim"] = int(need())
        elif k == "--rs":  # rebuild-only: interleaved RS(255,223) payload FEC
            p["rs"] = need() in ("1", "true")
        elif k == "--coherent":  # rebuild-only: channel-coherent payload
            p["coherent"] = need() in ("1", "true")
        elif k == "--pad":  # rebuild-only: payload padding quantum (bytes)
            p["pad_quantum"] = int(need())
            if p["pad_quantum"] < 0:  # 0 = explicitly off
                return None  # usage error, like any malformed flag value
        elif k == "--soft_decode":  # rebuild-only: soft-decision fallback
            p["soft_decode_fallback"] = need() in ("1", "true")
        elif k == "--stealth":  # rebuild-only: Params.stealth() preset
            stealth = need() in ("1", "true")
        elif k == "--in-dir":  # batch modes (rebuild-only)
            a.in_dir = need()
        elif k == "--out-dir":
            a.out_dir = need()
        elif k == "--secrets-file":
            a.secrets_file = need()
        elif k == "--verify":
            a.verify = need() in ("1", "true")
        elif k == "--warmup":  # serve-only: pre-compile serving classes
            v = need()
            try:
                dims, _, payload = v.lower().partition(":")
                h, w = dims.split("x")
                spec = ((int(h), int(w), int(payload))
                        if payload else (int(h), int(w)))
                if any(x <= 0 for x in spec):
                    raise ValueError(v)
                a.warmup.append(spec)
            except ValueError:
                print(f"Bad --warmup (want HxW[:PAYLOAD_BYTES]): {v}",
                      file=sys.stderr)
                return None
        else:
            print(f"Unknown arg: {k}", file=sys.stderr)
            return None
        i += 1
    if stealth:
        # preset seeds the defaults; explicit flags override it
        a.params = Params.stealth(**p)
    else:
        a.params = Params(**p)
    if a.mode == "gen-key":
        return a
    if a.mode in ("batch-embed", "batch-extract"):
        if not a.in_dir or (not a.password and not a.key_b64):
            return None
        if a.mode == "batch-embed" and (not a.out_dir or not a.secrets_file):
            return None
        return a
    if a.mode == "serve":
        return a if (a.password or a.key_b64) else None
    if a.mode not in ("embed", "extract", "check"):
        return None
    if not a.in_path:
        return None
    if not a.password and not a.key_b64:
        return None
    if a.mode == "embed" and (not a.out_path or not a.secret):
        return None
    if a.mode == "check" and not a.secret:
        return None
    return a


def _resolve_key(a: Args) -> tuple[str | None, bytes | None]:
    """-> (password, master_key); exits on undecodable --key."""
    if a.key_b64:
        mk = keywrap.decode_or_unwrap_key(a.key_b64, a.wrap_pass, a.params.pbkdf2_iter)
        if mk is None:
            print("Failed to decode/unwrap key from --key argument", file=sys.stderr)
            raise SystemExit(1)
        return None, mk
    return a.password, None


def do_embed(a: Args) -> int:
    from steganosaurus_tpu.pipeline.embed import embed

    password, mk = _resolve_key(a)
    res = embed(a.in_path, a.out_path, a.secret, password=password,
                master_key=mk, params=a.params)
    print(
        f"Embedded {res.written_bits} bits into {a.out_path} "
        f"(payload {res.payload_bytes} bytes, ver=2, salt/nonce in header)"
    )
    return 0


def do_check(a: Args) -> int:
    """Dry-run quality/detectability check (the reference doc/TODO.md
    "--test mode that computes PSNR/SSIM/KL before embedding" item, built
    as a mode): embeds IN MEMORY (nothing written), verifies round-trip
    extraction, and prints capacity, PSNR/SSIM, and the warden-view phase
    statistics vs the clean cover. rc 0 iff the payload fits and the
    round-trip verifies."""
    import numpy as np

    from steganosaurus_tpu.io import image as image_io
    from steganosaurus_tpu.pipeline.embed import embed_array
    from steganosaurus_tpu.pipeline.errors import StegoError
    from steganosaurus_tpu.pipeline.extract import extract_array
    from steganosaurus_tpu.utils import metrics
    from steganosaurus_tpu.utils.steganalysis import (
        annulus_phases, cross_channel_report, joint_residual_report,
        phase_histogram_report)

    password, mk = _resolve_key(a)
    cover = image_io.load_rgb(a.in_path)
    secret = a.secret.encode() if isinstance(a.secret, str) else a.secret
    try:
        res = embed_array(cover, secret, password=password, master_key=mk,
                          params=a.params)
    except StegoError as e:
        print(f"check FAILED: {e}")
        return 1
    stego = np.asarray(res.stego)
    try:
        ok = extract_array(stego, password=password, master_key=mk,
                           params=a.params) == secret
    except StegoError:
        ok = False
    psnr = metrics.psnr(cover, stego)
    ssim = metrics.ssim(cover, stego)
    # One annulus FFT per image, shared by both wardens below.
    th_cover = annulus_phases(cover, a.params)
    th_stego = annulus_phases(stego, a.params)
    clean = phase_histogram_report(cover, a.params, phases=th_cover)
    hot = phase_histogram_report(stego, a.params, phases=th_stego)
    print(f"capacity: {res.capacity_bits} bits, frame: {res.written_bits} "
          f"bits ({100.0 * res.written_bits / res.capacity_bits:.1f}% used)")
    print(f"quality: psnr {psnr:.2f} dB, ssim {ssim:.4f} "
          f"(guidance: >50 dB, >0.995)")
    print(f"warden: chi2_z {hot['chi2_z']:.1f} (cover {clean['chi2_z']:.1f})"
          f", spike_excess {hot['spike_excess']:.4f} "
          f"(cover {clean['spike_excess']:.4f})")
    # Cover screening for the §2e cross-channel warden: high alignment
    # means the cover's channels correlate and NO embedding knob hides
    # the write from a cross-channel statistic (doc/ATTACKS.md §2e).
    cc = cross_channel_report(stego, a.params, cover=cover,
                              phases=th_stego, cover_phases=th_cover)
    amax = max(cc["align_z"].values())
    print(f"cross-channel: align_z {amax:.1f} "
          f"({'correlated cover - write exposed to a cross-channel warden'
             if amax > 6 else 'iid channels - cross-channel warden blind'})"
          f", cond_off_z {cc['max_z']:.1f}")
    # Cover screening for the §2f joint phase-magnitude warden: high
    # spectral phase coherence means re-rolled phases at high-magnitude
    # bins are visible to a cover-model warden — again no embedding knob
    # hides it (doc/ATTACKS.md §2f).
    jr = joint_residual_report(stego, a.params, cover=cover)
    print(f"joint-residual: coherence {jr['top_coherence']:.3f} "
          f"({'phase-coherent cover - write exposed to a joint '
             'phase-magnitude warden'
             if jr['top_coherence'] > 0.1
             else 'iid phases - joint-residual warden blind'})"
          f", drop_z {jr['max_z']:.1f}")
    print(f"round-trip: {'ok' if ok else 'FAILED'}")
    return 0 if ok else 1


def do_extract(a: Args) -> int:
    from steganosaurus_tpu.pipeline.extract import extract

    password, mk = _resolve_key(a)
    secret = extract(a.in_path, password=password, master_key=mk, params=a.params)
    sys.stdout.buffer.write(secret + b"\n")
    return 0


CLI_BATCH = 32  # images per device batch on the CLI bulk paths


def _sorted_pngs(in_dir: str):
    import pathlib

    files = sorted(pathlib.Path(in_dir).glob("*.png"))
    if not files:
        raise StegoError(f"No *.png files in {in_dir}")
    # Group by shape so every same-size image lands in a shape-consecutive
    # run (batched graphs are shape-specialized; load_rgb_batches flushes on
    # shape change). Stable sort keeps name order within a shape.
    def shape_of(f):
        from PIL import Image

        with Image.open(f) as im:
            return im.size

    return sorted(files, key=lambda f: (shape_of(f), f.name))


def do_batch_embed(a: Args) -> int:
    """Bulk embed, fully pipelined (pipeline.stream): threaded PNG decode
    and per-image AEAD for batch N+1 overlap batch N's device graphs; PNG
    encode of batch N-1 overlaps both."""
    import pathlib

    from collections import deque

    import numpy as np

    from steganosaurus_tpu.io import image as image_io
    from steganosaurus_tpu.pipeline import stream

    password, mk = _resolve_key(a)
    secrets = [line.encode() for line in
               pathlib.Path(a.secrets_file).read_text().splitlines()]
    files = _sorted_pngs(a.in_dir)
    if len(secrets) != len(files):
        raise StegoError(
            f"{len(files)} images in {a.in_dir} but {len(secrets)} secrets "
            f"in {a.secrets_file}"
        )
    by_name = {f.name: s for f, s in
               zip(sorted(files, key=lambda f: f.name), secrets)}
    out_dir = pathlib.Path(a.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    names_q: deque[list[str]] = deque()

    def batches():
        for paths, covers in stream.load_rgb_batches(
                [str(f) for f in files], CLI_BATCH):
            names = [pathlib.Path(p).name for p in paths]
            names_q.append(names)
            yield covers, [by_name[n] for n in names]

    n_ok = 0
    for res in stream.embed_stream(batches(), password=password,
                                   master_key=mk, params=a.params,
                                   verify=a.verify):
        names = names_q.popleft()
        stego = np.asarray(res.stego)
        for j, name in enumerate(names):
            if a.verify and not res.verified[j]:
                print(f"FAILED verify: {name}", file=sys.stderr)
                continue
            image_io.save_png(str(out_dir / name), stego[j])
            n_ok += 1
    print(f"Embedded {n_ok}/{len(files)} images into {a.out_dir}")
    return 0 if n_ok == len(files) else 1


def do_batch_extract(a: Args) -> int:
    import pathlib

    from collections import deque

    from steganosaurus_tpu.pipeline import stream

    password, mk = _resolve_key(a)
    files = _sorted_pngs(a.in_dir)
    names_q: deque[list[str]] = deque()

    def batches():
        for paths, stegos in stream.load_rgb_batches(
                [str(f) for f in files], CLI_BATCH):
            names_q.append([pathlib.Path(p).name for p in paths])
            yield stegos

    results: list[tuple[str, bytes | None]] = []
    for got in stream.extract_stream(batches(), password=password,
                                     master_key=mk, params=a.params):
        results += list(zip(names_q.popleft(), got))
    failed = 0
    for name, secret in sorted(results):
        if secret is None:
            failed += 1
            print(f"{name}\t<FAILED>")
        else:
            sys.stdout.write(name + "\t")
            sys.stdout.buffer.write(secret + b"\n")
    return 0 if failed == 0 else 1


def do_gen_key(a: Args) -> int:
    """Mirror of reference do_gen_key (steganosaur.cpp:1315-1416)."""
    master_key = crypto.get_random_bytes(32)
    key_b64 = crypto.base64_encode(master_key)
    print("Generated 256-bit master key:")
    print(f"  Base64: {key_b64}")
    print(f"  Fingerprint: {crypto.key_fingerprint(master_key)}")
    if a.key_out:
        if a.wrap_pass:
            blob = keywrap.wrap_key_main(master_key, a.wrap_pass, a.params.pbkdf2_iter)
            with open(a.key_out, "w") as f:
                f.write(crypto.base64_encode(blob) + "\n")
            print(f"  Wrapped with passphrase and exported to: {a.key_out}")
        else:
            with open(a.key_out, "w") as f:
                f.write(key_b64 + "\n")
            print(f"  Exported (unencrypted) to: {a.key_out}")
    return 0


def do_serve(a: Args) -> int:
    """Steady-state serving worker (pipeline/serve.py): JSON-lines on
    stdin/stdout; the (key, params) pair is pinned for the process
    lifetime so every process-level cache stays warm across requests."""
    from steganosaurus_tpu.pipeline.serve import serve_loop

    password, mk = _resolve_key(a)
    return serve_loop(password, mk, a.params, warmup=a.warmup)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv if argv is None else argv
    a = parse_args(argv)
    if a is None:
        print(USAGE, file=sys.stderr)
        return 1
    from steganosaurus_tpu import runtime

    # Honor STEGANOSAURUS_PLATFORM before any device use. The tunneled axon
    # runtime IGNORES the JAX_PLATFORMS env var (tests/conftest.py documents
    # the quirk); jax.config.update is the only reliable switch, and without
    # it every CLI invocation initializes the remote TPU — which stalls the
    # shell suites (scripts/test_hardening.sh) whose properties under test
    # are control-flow, not device speed.
    import os

    plat = os.environ.get("STEGANOSAURUS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    runtime.enable_compilation_cache()
    try:
        if a.mode == "gen-key":
            return do_gen_key(a)
        if a.mode == "embed":
            return do_embed(a)
        if a.mode == "batch-embed":
            return do_batch_embed(a)
        if a.mode == "batch-extract":
            return do_batch_extract(a)
        if a.mode == "check":
            return do_check(a)
        if a.mode == "serve":
            return do_serve(a)
        return do_extract(a)
    except StegoError as e:
        print(str(e), file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
