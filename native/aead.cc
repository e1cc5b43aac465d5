#include "aead.h"

#include <cstring>

#include "sha256.h"  // secure_wipe

namespace stego {
namespace {

inline uint32_t load32le(const uint8_t* p) {
  return uint32_t(p[0]) | (uint32_t(p[1]) << 8) | (uint32_t(p[2]) << 16) |
         (uint32_t(p[3]) << 24);
}

inline void store32le(uint32_t v, uint8_t* p) {
  p[0] = uint8_t(v);
  p[1] = uint8_t(v >> 8);
  p[2] = uint8_t(v >> 16);
  p[3] = uint8_t(v >> 24);
}

inline uint32_t rotl(uint32_t v, int n) { return (v << n) | (v >> (32 - n)); }

inline void quarter(uint32_t& a, uint32_t& b, uint32_t& c, uint32_t& d) {
  a += b; d ^= a; d = rotl(d, 16);
  c += d; b ^= c; b = rotl(b, 12);
  a += b; d ^= a; d = rotl(d, 8);
  c += d; b ^= c; b = rotl(b, 7);
}

void chacha_block(const uint32_t init[16], uint8_t out[64]) {
  uint32_t x[16];
  std::memcpy(x, init, 64);
  for (int i = 0; i < 10; ++i) {
    quarter(x[0], x[4], x[8], x[12]);
    quarter(x[1], x[5], x[9], x[13]);
    quarter(x[2], x[6], x[10], x[14]);
    quarter(x[3], x[7], x[11], x[15]);
    quarter(x[0], x[5], x[10], x[15]);
    quarter(x[1], x[6], x[11], x[12]);
    quarter(x[2], x[7], x[8], x[13]);
    quarter(x[3], x[4], x[9], x[14]);
  }
  for (int i = 0; i < 16; ++i) store32le(x[i] + init[i], out + 4 * i);
}

void chacha_init(uint32_t st[16], const uint8_t key[32],
                 const uint8_t nonce[12], uint32_t counter) {
  static const uint8_t sigma[16] = {'e', 'x', 'p', 'a', 'n', 'd', ' ', '3',
                                    '2', '-', 'b', 'y', 't', 'e', ' ', 'k'};
  st[0] = load32le(sigma);
  st[1] = load32le(sigma + 4);
  st[2] = load32le(sigma + 8);
  st[3] = load32le(sigma + 12);
  for (int i = 0; i < 8; ++i) st[4 + i] = load32le(key + 4 * i);
  st[12] = counter;
  st[13] = load32le(nonce);
  st[14] = load32le(nonce + 4);
  st[15] = load32le(nonce + 8);
}

void chacha_xor(const uint8_t key[32], const uint8_t nonce[12],
                uint32_t counter, const uint8_t* in, uint8_t* out,
                size_t len) {
  uint32_t st[16];
  chacha_init(st, key, nonce, counter);
  uint8_t ks[64];
  size_t off = 0;
  while (off < len) {
    chacha_block(st, ks);
    st[12]++;
    size_t n = len - off < 64 ? len - off : 64;
    for (size_t i = 0; i < n; ++i) out[off + i] = in[off + i] ^ ks[i];
    off += n;
  }
  // st[4..11] is the raw key; ks is live keystream
  stego::secure_wipe(st, sizeof(st));
  stego::secure_wipe(ks, sizeof(ks));
}

// Poly1305 over 26-bit limbs.
struct Poly1305 {
  uint64_t r[5];
  uint64_t h[5] = {0, 0, 0, 0, 0};
  uint64_t pad[4];

  explicit Poly1305(const uint8_t key[32]) {
    r[0] = load32le(key) & 0x3ffffff;
    r[1] = (load32le(key + 3) >> 2) & 0x3ffff03;
    r[2] = (load32le(key + 6) >> 4) & 0x3ffc0ff;
    r[3] = (load32le(key + 9) >> 6) & 0x3f03fff;
    r[4] = (load32le(key + 12) >> 8) & 0x00fffff;
    for (int i = 0; i < 4; ++i) pad[i] = load32le(key + 16 + 4 * i);
  }

  void blocks(const uint8_t* m, size_t len, uint64_t hibit) {
    const uint64_t s1 = r[1] * 5, s2 = r[2] * 5, s3 = r[3] * 5, s4 = r[4] * 5;
    while (len >= 16) {
      h[0] += load32le(m) & 0x3ffffff;
      h[1] += (load32le(m + 3) >> 2) & 0x3ffffff;
      h[2] += (load32le(m + 6) >> 4) & 0x3ffffff;
      h[3] += (load32le(m + 9) >> 6) & 0x3ffffff;
      h[4] += (load32le(m + 12) >> 8) | hibit;

      uint64_t d0 = h[0] * r[0] + h[1] * s4 + h[2] * s3 + h[3] * s2 + h[4] * s1;
      uint64_t d1 = h[0] * r[1] + h[1] * r[0] + h[2] * s4 + h[3] * s3 + h[4] * s2;
      uint64_t d2 = h[0] * r[2] + h[1] * r[1] + h[2] * r[0] + h[3] * s4 + h[4] * s3;
      uint64_t d3 = h[0] * r[3] + h[1] * r[2] + h[2] * r[1] + h[3] * r[0] + h[4] * s4;
      uint64_t d4 = h[0] * r[4] + h[1] * r[3] + h[2] * r[2] + h[3] * r[1] + h[4] * r[0];

      uint64_t c = d0 >> 26; h[0] = d0 & 0x3ffffff;
      d1 += c; c = d1 >> 26; h[1] = d1 & 0x3ffffff;
      d2 += c; c = d2 >> 26; h[2] = d2 & 0x3ffffff;
      d3 += c; c = d3 >> 26; h[3] = d3 & 0x3ffffff;
      d4 += c; c = d4 >> 26; h[4] = d4 & 0x3ffffff;
      h[0] += c * 5; c = h[0] >> 26; h[0] &= 0x3ffffff; h[1] += c;

      m += 16;
      len -= 16;
    }
  }

  uint8_t buf[16];
  size_t buf_len = 0;

  // Streaming update: buffers across calls; the trailing partial block (if
  // any) is consumed by final().
  void update(const uint8_t* m, size_t len) {
    if (buf_len > 0) {
      size_t take = 16 - buf_len;
      if (take > len) take = len;
      std::memcpy(buf + buf_len, m, take);
      buf_len += take;
      m += take;
      len -= take;
      if (buf_len == 16) {
        blocks(buf, 16, 1ull << 24);
        buf_len = 0;
      }
    }
    size_t full = len & ~size_t(15);
    blocks(m, full, 1ull << 24);
    if (len > full) {
      std::memcpy(buf, m + full, len - full);
      buf_len = len - full;
    }
  }

  // ref_compat=true reproduces the reference's tag serialization bug
  // (steganosaur.cpp:261-264): the limb-to-word conversion adds an UNMASKED
  // carry, double-counting each limb's high bits. The reference is
  // self-consistent about it, so interop requires reproducing it exactly.
  // ref_compat=false is the RFC 8439 / poly1305-donna serialization.
  void final(uint8_t tag[16], bool ref_compat) {
    if (buf_len > 0) {
      uint8_t last[16] = {0};
      std::memcpy(last, buf, buf_len);
      last[buf_len] = 1;  // pad bit folded into the block, hibit suppressed
      blocks(last, 16, 0);
    }
    uint64_t c = h[1] >> 26; h[1] &= 0x3ffffff; h[2] += c;
    c = h[2] >> 26; h[2] &= 0x3ffffff; h[3] += c;
    c = h[3] >> 26; h[3] &= 0x3ffffff; h[4] += c;
    c = h[4] >> 26; h[4] &= 0x3ffffff; h[0] += c * 5;
    c = h[0] >> 26; h[0] &= 0x3ffffff; h[1] += c;

    uint64_t g0 = h[0] + 5; c = g0 >> 26; g0 &= 0x3ffffff;
    uint64_t g1 = h[1] + c; c = g1 >> 26; g1 &= 0x3ffffff;
    uint64_t g2 = h[2] + c; c = g2 >> 26; g2 &= 0x3ffffff;
    uint64_t g3 = h[3] + c; c = g3 >> 26; g3 &= 0x3ffffff;
    uint64_t g4 = h[4] + c - (1ull << 26);

    uint64_t mask = (g4 >> 63) - 1;  // all-ones iff h >= p
    h[0] = (h[0] & ~mask) | (g0 & mask);
    h[1] = (h[1] & ~mask) | (g1 & mask);
    h[2] = (h[2] & ~mask) | (g2 & mask);
    h[3] = (h[3] & ~mask) | (g3 & mask);
    h[4] = (h[4] & ~mask) | (g4 & mask);

    uint64_t f0, f1, f2, f3;
    if (ref_compat) {
      f0 = (h[0] | (h[1] << 26)) + pad[0];
      f1 = ((h[1] >> 6) | (h[2] << 20)) + pad[1] + (f0 >> 32);
      f2 = ((h[2] >> 12) | (h[3] << 14)) + pad[2] + (f1 >> 32);
      f3 = ((h[3] >> 18) | (h[4] << 8)) + pad[3] + (f2 >> 32);
    } else {
      uint64_t w0 = (h[0] | (h[1] << 26)) & 0xffffffff;
      uint64_t w1 = ((h[1] >> 6) | (h[2] << 20)) & 0xffffffff;
      uint64_t w2 = ((h[2] >> 12) | (h[3] << 14)) & 0xffffffff;
      uint64_t w3 = ((h[3] >> 18) | (h[4] << 8)) & 0xffffffff;
      f0 = w0 + pad[0];
      f1 = w1 + pad[1] + (f0 >> 32);
      f2 = w2 + pad[2] + (f1 >> 32);
      f3 = w3 + pad[3] + (f2 >> 32);
    }
    store32le(uint32_t(f0), tag);
    store32le(uint32_t(f1), tag + 4);
    store32le(uint32_t(f2), tag + 8);
    store32le(uint32_t(f3), tag + 12);
  }
};

void aead_tag(const uint8_t otk[32], const uint8_t* aad, size_t aadlen,
              const uint8_t* ct, size_t ctlen, uint8_t tag[16],
              bool ref_compat) {
  Poly1305 p(otk);
  static const uint8_t zeros[16] = {0};
  if (aadlen) {
    p.update(aad, aadlen);
    if (aadlen % 16) p.update(zeros, 16 - aadlen % 16);
  }
  if (ctlen) {
    p.update(ct, ctlen);
    if (ctlen % 16) p.update(zeros, 16 - ctlen % 16);
  }
  uint8_t lens[16];
  for (int i = 0; i < 8; ++i) lens[i] = uint8_t(uint64_t(aadlen) >> (8 * i));
  for (int i = 0; i < 8; ++i) lens[8 + i] = uint8_t(uint64_t(ctlen) >> (8 * i));
  p.update(lens, 16);
  p.final(tag, ref_compat);
  stego::secure_wipe(&p, sizeof(p));  // r/s key limbs + accumulator
}

}  // namespace

int aead_seal(const uint8_t key[32], const uint8_t nonce[12],
              const uint8_t* aad, size_t aadlen, const uint8_t* pt, size_t len,
              uint8_t* ct_out, uint8_t tag_out[16], bool ref_compat) {
  uint32_t st[16];
  chacha_init(st, key, nonce, 0);
  uint8_t otk_block[64];
  chacha_block(st, otk_block);
  chacha_xor(key, nonce, 1, pt, ct_out, len);
  aead_tag(otk_block, aad, aadlen, ct_out, len, tag_out, ref_compat);
  secure_wipe(st, sizeof(st));
  secure_wipe(otk_block, sizeof(otk_block));
  return 0;
}

int aead_open(const uint8_t key[32], const uint8_t nonce[12],
              const uint8_t* aad, size_t aadlen, const uint8_t* ct, size_t len,
              const uint8_t tag[16], uint8_t* pt_out, bool ref_compat) {
  uint32_t st[16];
  chacha_init(st, key, nonce, 0);
  uint8_t otk_block[64];
  chacha_block(st, otk_block);
  uint8_t expect[16];
  aead_tag(otk_block, aad, aadlen, ct, len, expect, ref_compat);
  secure_wipe(st, sizeof(st));
  secure_wipe(otk_block, sizeof(otk_block));
  volatile uint8_t diff = 0;
  for (int i = 0; i < 16; ++i) diff |= uint8_t(expect[i] ^ tag[i]);
  if (diff != 0) {
    std::memset(pt_out, 0, len);
    return -1;
  }
  chacha_xor(key, nonce, 1, ct, pt_out, len);
  return 0;
}

}  // namespace stego
