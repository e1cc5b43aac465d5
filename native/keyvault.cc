// Native key vault: derived AEAD keys live in mlock'd slots, are used for
// seal/open by handle, and are volatile-wiped on destroy — they never
// round-trip through Python `bytes` (VERDICT r3 weak #6 / HARDENING §6).
//
// The reference wipes its key temporaries consistently
// (/root/reference/steganosaurus/src/steganosaur.cpp:27-30,
// src/crypto/crypto_utils.h:37-40) but, being a single C++ process, never
// faces the Python-side problem this solves: immutable bytes objects that
// the GC may copy and cannot be zeroed. Here the full hot path — PBKDF2/
// HKDF derivation, ChaCha20-Poly1305 seal/open, wipe — runs inside this
// library; only the NONCE leaves (it is public: serialized into the
// plaintext stego header). The passphrase itself still arrives from Python
// (argv/getpass), the same exposure the reference has.
//
// mlock is best-effort: under RLIMIT_MEMLOCK pressure the slots still work,
// just without the no-swap guarantee (stego_kv_mlocked() reports which).

#include <sys/mman.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>

#include "aead.h"
#include "sha256.h"

namespace {

constexpr int MAX_SLOTS = 128;

struct Slot {
  uint8_t key[32];
  uint8_t nonce[12];
  uint8_t used;
};

Slot* g_slots = nullptr;
int g_mlocked = 0;
std::mutex g_mu;

void wipe(void* p, size_t n) {
  volatile uint8_t* v = static_cast<volatile uint8_t*>(p);
  while (n--) *v++ = 0;
}

bool ensure_slots_locked() {  // call with g_mu held
  if (g_slots) return true;
  size_t bytes = sizeof(Slot) * MAX_SLOTS;
  void* mem = nullptr;
  if (posix_memalign(&mem, 4096, bytes) != 0) return false;
  std::memset(mem, 0, bytes);
  g_mlocked = (mlock(mem, bytes) == 0) ? 1 : 0;
  g_slots = static_cast<Slot*>(mem);
  return true;
}

int alloc_slot_locked() {
  for (int i = 0; i < MAX_SLOTS; ++i)
    if (!g_slots[i].used) {
      g_slots[i].used = 1;
      return i;
    }
  return -1;
}

// HKDF-expand(prk, "fft_turtle:keys", 76) -> okm; slot gets okm[32:64] (aead
// key) + okm[64:76] (nonce). Mirrors crypto/__init__.py derive_keys*
// (reference steganosaur.cpp:556-591). okm[0:32] is the reference's dead
// path_key field — derived and discarded, wiped with the rest.
int finish_derive(const uint8_t prk[32], uint8_t* nonce_out) {
  static const uint8_t kInfo[] = "fft_turtle:keys";
  uint8_t okm[76];
  stego::hkdf_expand_sha256(prk, kInfo, sizeof(kInfo) - 1, okm, sizeof(okm));
  std::lock_guard<std::mutex> lk(g_mu);
  if (!ensure_slots_locked()) {
    wipe(okm, sizeof(okm));
    return -1;
  }
  int h = alloc_slot_locked();
  if (h >= 0) {
    std::memcpy(g_slots[h].key, okm + 32, 32);
    std::memcpy(g_slots[h].nonce, okm + 64, 12);
    if (nonce_out) std::memcpy(nonce_out, okm + 64, 12);
  }
  wipe(okm, sizeof(okm));
  return h;
}

}  // namespace

extern "C" {

// Passphrase path: PBKDF2(pass,salt,iters) -> HKDF-extract(empty) ->
// expand. Returns a slot handle >= 0, or -1 (vault full / alloc failure).
// nonce_out (12 bytes, may be null) receives the PUBLIC nonce.
int stego_kv_derive_pass(const uint8_t* pass, size_t passlen,
                         const uint8_t* salt, size_t saltlen, uint32_t iters,
                         uint8_t* nonce_out) {
  uint8_t dk[32], prk[32];
  stego::pbkdf2_hmac_sha256(pass, passlen, salt, saltlen, iters, dk,
                            sizeof(dk));
  static const uint8_t kEmpty[1] = {0};
  stego::hmac_sha256(kEmpty, 0, dk, sizeof(dk), prk);  // extract, empty salt
  int h = finish_derive(prk, nonce_out);
  wipe(dk, sizeof(dk));
  wipe(prk, sizeof(prk));
  return h;
}

// Raw-master-key path: HKDF-extract(salt, master) -> expand.
int stego_kv_derive_raw(const uint8_t* master, size_t mlen,
                        const uint8_t* salt, size_t saltlen,
                        uint8_t* nonce_out) {
  uint8_t prk[32];
  stego::hmac_sha256(salt, saltlen, master, mlen, prk);
  int h = finish_derive(prk, nonce_out);
  wipe(prk, sizeof(prk));
  return h;
}

int stego_kv_seal(int h, const uint8_t* aad, size_t aadlen, const uint8_t* pt,
                  size_t len, uint8_t* ct_out, uint8_t* tag_out,
                  int ref_compat) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (!g_slots || h < 0 || h >= MAX_SLOTS || !g_slots[h].used) return -2;
  return stego::aead_seal(g_slots[h].key, g_slots[h].nonce, aad, aadlen, pt,
                          len, ct_out, tag_out, ref_compat != 0);
}

int stego_kv_open(int h, const uint8_t* aad, size_t aadlen, const uint8_t* ct,
                  size_t len, const uint8_t* tag, uint8_t* pt_out,
                  int ref_compat) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (!g_slots || h < 0 || h >= MAX_SLOTS || !g_slots[h].used) return -2;
  return stego::aead_open(g_slots[h].key, g_slots[h].nonce, aad, aadlen, ct,
                          len, tag, pt_out, ref_compat != 0);
}

// HKDF-expand(aead_key, info, outlen) — one-way export used for the
// FLAG_PADDED pad stream (pipeline/header.py pad_plaintext). Exporting
// HKDF output does not expose the key.
int stego_kv_hkdf(int h, const uint8_t* info, size_t infolen, uint8_t* out,
                  size_t outlen) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (!g_slots || h < 0 || h >= MAX_SLOTS || !g_slots[h].used) return -2;
  stego::hkdf_expand_sha256(g_slots[h].key, info, infolen, out, outlen);
  return 0;
}

int stego_kv_destroy(int h) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (!g_slots || h < 0 || h >= MAX_SLOTS || !g_slots[h].used) return -2;
  wipe(&g_slots[h], sizeof(Slot));  // key, nonce, and the used flag
  return 0;
}

// Introspection: 1 when the slot region is mlock'd (no-swap guarantee).
int stego_kv_mlocked(void) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (!ensure_slots_locked()) return 0;
  return g_mlocked;
}

}  // extern "C"
