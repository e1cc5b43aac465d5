"""steganosaurus_tpu — TPU-native rebuild of TurtleFFT (rickenator/steganosaurus).

A JAX/XLA/Pallas framework that hides a ChaCha20-Poly1305-encrypted,
repetition-ECC-protected secret in the phase of the 2D FFT of an RGB image,
selecting frequency bins via a keyed pseudo-random "turtle walk".

Architecture (TPU-first, not a translation of the C++ reference):

- ``crypto/``    host-side crypto (SHA-256/HMAC/PBKDF2/HKDF via OpenSSL-backed
                 stdlib, clean-room ChaCha20-Poly1305, key wrap formats).
                 Native C++ backend in ``native/`` when built.
- ``keystream/`` the sequential keyed turtle walk, refactored into *host-side
                 keystream expansion* (C++ fast path): emits int32 bin-index
                 arrays + jitter arrays so the device side is fully vectorized.
- ``spectral/``  JAX 2D FFT over padded R/G/B planes (complex64 on TPU,
                 complex128 arbiter on CPU), plane conversion, medians.
- ``ops/``       vectorized device ops: gather -> phase-rotate -> scatter with
                 conjugate mirroring, ECC encode/majority-decode as reductions,
                 bit/byte packing, annulus capacity masks.
- ``pipeline/``  embed / extract / gen-key orchestration, header framing,
                 batched + pjit-sharded variants.
- ``cli``        flag- and output-compatible `turtlefft` / `turtlefft-key`.

Reference behavior is documented per-function with `file:line` citations into
the reference tree (steganosaurus/src/steganosaur.cpp et al.).
"""

from steganosaurus_tpu.config import Params

__version__ = "0.1.0"

__all__ = ["Params", "__version__"]
