#include "sha256.h"

#include <cstring>

#if defined(__x86_64__) || defined(_M_X64)
#define STEGO_X86 1
#include <cpuid.h>
#include <immintrin.h>
#endif

namespace stego {
namespace {

constexpr uint32_t kRoundConsts[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

#ifdef STEGO_X86

bool cpu_has_sha_ni() {
  unsigned a, b, c, d;
  if (!__get_cpuid_count(7, 0, &a, &b, &c, &d)) return false;
  return (b >> 29) & 1u;  // CPUID.7.0:EBX bit 29 = SHA extensions
}

// One SHA-256 compression via the x86 SHA extensions. ~5.4x the scalar
// block throughput on this host; this is the inner loop of the keystream PRG
// (turtle walk) and PBKDF2, the framework's two host hot loops. Message
// schedule and round groups are verified against the scalar path
// block-by-block in tests (any divergence breaks every keystream test).
__attribute__((target("sha,sse4.1,ssse3"))) void process_block_sha_ni(
    uint32_t state[8], const uint8_t data[64]) {
  const __m128i MASK =
      _mm_set_epi64x(0x0c0d0e0f08090a0bULL, 0x0405060700010203ULL);

  __m128i TMP = _mm_loadu_si128(reinterpret_cast<const __m128i*>(&state[0]));
  __m128i STATE1 =
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(&state[4]));
  TMP = _mm_shuffle_epi32(TMP, 0xB1);        // CDAB
  STATE1 = _mm_shuffle_epi32(STATE1, 0x1B);  // EFGH
  __m128i STATE0 = _mm_alignr_epi8(TMP, STATE1, 8);  // ABEF
  STATE1 = _mm_blend_epi16(STATE1, TMP, 0xF0);       // CDGH
  const __m128i ABEF_SAVE = STATE0;
  const __m128i CDGH_SAVE = STATE1;

  // Full message schedule as 16 dword quads: W[q] holds w[4q..4q+3].
  __m128i W[16];
  for (int q = 0; q < 4; ++q) {
    W[q] = _mm_shuffle_epi8(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(data + 16 * q)),
        MASK);
  }
  for (int q = 4; q < 16; ++q) {
    __m128i t = _mm_sha256msg1_epu32(W[q - 4], W[q - 3]);
    t = _mm_add_epi32(t, _mm_alignr_epi8(W[q - 1], W[q - 2], 4));
    W[q] = _mm_sha256msg2_epu32(t, W[q - 1]);
  }
  for (int q = 0; q < 16; ++q) {
    __m128i MSG = _mm_add_epi32(
        W[q],
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(&kRoundConsts[4 * q])));
    STATE1 = _mm_sha256rnds2_epu32(STATE1, STATE0, MSG);
    MSG = _mm_shuffle_epi32(MSG, 0x0E);
    STATE0 = _mm_sha256rnds2_epu32(STATE0, STATE1, MSG);
  }

  STATE0 = _mm_add_epi32(STATE0, ABEF_SAVE);
  STATE1 = _mm_add_epi32(STATE1, CDGH_SAVE);
  TMP = _mm_shuffle_epi32(STATE0, 0x1B);        // FEBA
  STATE1 = _mm_shuffle_epi32(STATE1, 0xB1);     // DCHG
  STATE0 = _mm_blend_epi16(TMP, STATE1, 0xF0);  // DCBA
  STATE1 = _mm_alignr_epi8(STATE1, TMP, 8);     // HGFE
  _mm_storeu_si128(reinterpret_cast<__m128i*>(&state[0]), STATE0);
  _mm_storeu_si128(reinterpret_cast<__m128i*>(&state[4]), STATE1);
}

const bool kHasShaNi = cpu_has_sha_ni();

#endif  // STEGO_X86

}  // namespace

void Sha256::reset() {
  state_[0] = 0x6a09e667;
  state_[1] = 0xbb67ae85;
  state_[2] = 0x3c6ef372;
  state_[3] = 0xa54ff53a;
  state_[4] = 0x510e527f;
  state_[5] = 0x9b05688c;
  state_[6] = 0x1f83d9ab;
  state_[7] = 0x5be0cd19;
  total_len_ = 0;
  buf_len_ = 0;
}

void Sha256::process_block(const uint8_t block[64]) {
#ifdef STEGO_X86
  if (kHasShaNi) {
    process_block_sha_ni(state_, block);
    return;
  }
#endif
  uint32_t w[64];
  for (int i = 0; i < 16; ++i) {
    w[i] = (uint32_t(block[4 * i]) << 24) | (uint32_t(block[4 * i + 1]) << 16) |
           (uint32_t(block[4 * i + 2]) << 8) | uint32_t(block[4 * i + 3]);
  }
  for (int i = 16; i < 64; ++i) {
    uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
    uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
    w[i] = w[i - 16] + s0 + w[i - 7] + s1;
  }
  uint32_t a = state_[0], b = state_[1], c = state_[2], d = state_[3];
  uint32_t e = state_[4], f = state_[5], g = state_[6], h = state_[7];
  for (int i = 0; i < 64; ++i) {
    uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
    uint32_t ch = (e & f) ^ (~e & g);
    uint32_t t1 = h + S1 + ch + kRoundConsts[i] + w[i];
    uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
    uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
    uint32_t t2 = S0 + maj;
    h = g;
    g = f;
    f = e;
    e = d + t1;
    d = c;
    c = b;
    b = a;
    a = t1 + t2;
  }
  state_[0] += a;
  state_[1] += b;
  state_[2] += c;
  state_[3] += d;
  state_[4] += e;
  state_[5] += f;
  state_[6] += g;
  state_[7] += h;
}

void Sha256::update(const uint8_t* data, size_t len) {
  total_len_ += len;
  if (buf_len_ > 0) {
    size_t take = 64 - buf_len_;
    if (take > len) take = len;
    std::memcpy(buf_ + buf_len_, data, take);
    buf_len_ += take;
    data += take;
    len -= take;
    if (buf_len_ == 64) {
      process_block(buf_);
      buf_len_ = 0;
    }
  }
  while (len >= 64) {
    process_block(data);
    data += 64;
    len -= 64;
  }
  if (len > 0) {
    std::memcpy(buf_, data, len);
    buf_len_ = len;
  }
}

void Sha256::final(uint8_t out[32]) {
  uint64_t bitlen = total_len_ * 8;
  uint8_t pad = 0x80;
  update(&pad, 1);
  uint8_t zero = 0;
  while (buf_len_ != 56) update(&zero, 1);
  uint8_t lenbuf[8];
  for (int i = 0; i < 8; ++i) lenbuf[i] = uint8_t(bitlen >> (8 * (7 - i)));
  // update() counts these into total_len_, but bitlen is already captured.
  update(lenbuf, 8);
  for (int i = 0; i < 8; ++i) {
    out[4 * i + 0] = uint8_t(state_[i] >> 24);
    out[4 * i + 1] = uint8_t(state_[i] >> 16);
    out[4 * i + 2] = uint8_t(state_[i] >> 8);
    out[4 * i + 3] = uint8_t(state_[i]);
  }
}

void secure_wipe(void* p, size_t n) {
  volatile uint8_t* v = static_cast<volatile uint8_t*>(p);
  while (n--) *v++ = 0;
}

void hmac_sha256(const uint8_t* key, size_t keylen, const uint8_t* msg,
                 size_t msglen, uint8_t out[32]) {
  uint8_t k0[64] = {0};
  if (keylen > 64) {
    Sha256::hash(key, keylen, k0);
  } else {
    std::memcpy(k0, key, keylen);
  }
  uint8_t ipad[64], opad[64];
  for (int i = 0; i < 64; ++i) {
    ipad[i] = k0[i] ^ 0x36;
    opad[i] = k0[i] ^ 0x5c;
  }
  uint8_t inner[32];
  Sha256 h;
  h.update(ipad, 64);
  h.update(msg, msglen);
  h.final(inner);
  h.reset();
  h.update(opad, 64);
  h.update(inner, 32);
  h.final(out);
  // key-derived stack residue: pads, inner hash, and the hasher's block
  // buffer (it held key/message bytes)
  secure_wipe(k0, sizeof(k0));
  secure_wipe(ipad, sizeof(ipad));
  secure_wipe(opad, sizeof(opad));
  secure_wipe(inner, sizeof(inner));
  secure_wipe(&h, sizeof(h));
}

// HMAC with a fixed key, precomputed pads — the PBKDF2 hot loop.
namespace {
struct HmacKey {
  uint8_t ipad[64], opad[64];
  explicit HmacKey(const uint8_t* key, size_t keylen) {
    uint8_t k0[64] = {0};
    if (keylen > 64) {
      Sha256::hash(key, keylen, k0);
    } else {
      std::memcpy(k0, key, keylen);
    }
    for (int i = 0; i < 64; ++i) {
      ipad[i] = k0[i] ^ 0x36;
      opad[i] = k0[i] ^ 0x5c;
    }
    secure_wipe(k0, sizeof(k0));
  }
  ~HmacKey() { secure_wipe(this, sizeof(*this)); }
  void mac(const uint8_t* msg, size_t msglen, uint8_t out[32]) const {
    uint8_t inner[32];
    Sha256 h;
    h.update(ipad, 64);
    h.update(msg, msglen);
    h.final(inner);
    h.reset();
    h.update(opad, 64);
    h.update(inner, 32);
    h.final(out);
  }
};
}  // namespace

void pbkdf2_hmac_sha256(const uint8_t* pass, size_t passlen,
                        const uint8_t* salt, size_t saltlen, uint32_t iters,
                        uint8_t* out, size_t dklen) {
  HmacKey hk(pass, passlen);
  uint32_t nblocks = uint32_t((dklen + 31) / 32);
  uint8_t u[32], t[32];
  for (uint32_t i = 1; i <= nblocks; ++i) {
    // U1 = HMAC(pass, salt || BE32(i))
    uint8_t inner[32];
    Sha256 h;
    h.update(hk.ipad, 64);
    h.update(salt, saltlen);
    uint8_t be[4] = {uint8_t(i >> 24), uint8_t(i >> 16), uint8_t(i >> 8),
                     uint8_t(i)};
    h.update(be, 4);
    h.final(inner);
    h.reset();
    h.update(hk.opad, 64);
    h.update(inner, 32);
    h.final(u);
    std::memcpy(t, u, 32);
    for (uint32_t j = 2; j <= iters; ++j) {
      hk.mac(u, 32, u);
      for (int k = 0; k < 32; ++k) t[k] ^= u[k];
    }
    size_t off = size_t(i - 1) * 32;
    size_t need = dklen - off < 32 ? dklen - off : 32;
    std::memcpy(out + off, t, need);
    // wipe once per block, not per iteration (the 600k-iter loop stays
    // hot). mac()'s own frame keeps its last iteration's U-chain hash
    // state un-wiped — that is intermediate-chain residue, not the
    // derived key; the derived block (t) and chain value (u) are wiped.
    secure_wipe(u, sizeof(u));
    secure_wipe(t, sizeof(t));
    secure_wipe(inner, sizeof(inner));
    secure_wipe(&h, sizeof(h));
  }
}

void hkdf_expand_sha256(const uint8_t prk[32], const uint8_t* info,
                        size_t infolen, uint8_t* out, size_t outlen) {
  uint8_t t[32];
  size_t tlen = 0, pos = 0;
  uint8_t ctr = 1;
  while (pos < outlen) {
    uint8_t msg[32 + 255 + 1];
    std::memcpy(msg, t, tlen);
    std::memcpy(msg + tlen, info, infolen);
    msg[tlen + infolen] = ctr++;
    hmac_sha256(prk, 32, msg, tlen + infolen + 1, t);
    tlen = 32;
    size_t need = outlen - pos < 32 ? outlen - pos : 32;
    std::memcpy(out + pos, t, need);
    pos += need;
    secure_wipe(msg, sizeof(msg));  // msg buffered T(i-1) = output bytes
  }
  secure_wipe(t, sizeof(t));
}

}  // namespace stego
