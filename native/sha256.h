// SHA-256 (FIPS 180-4). Incremental interface so the keystream PRG can hash
// key||tag||counter without heap allocation per block.
#pragma once

#include <cstddef>
#include <cstdint>

namespace stego {

class Sha256 {
 public:
  Sha256() { reset(); }

  void reset();
  void update(const uint8_t* data, size_t len);
  void final(uint8_t out[32]);

  static void hash(const uint8_t* data, size_t len, uint8_t out[32]) {
    Sha256 h;
    h.update(data, len);
    h.final(out);
  }

 private:
  void process_block(const uint8_t block[64]);

  uint32_t state_[8];
  uint64_t total_len_;
  uint8_t buf_[64];
  size_t buf_len_;
};

// Volatile-store wipe the optimizer cannot elide (reference secure_zero,
// steganosaur.cpp:27-30 / crypto_utils.h:37-40).
void secure_wipe(void* p, size_t n);

void hmac_sha256(const uint8_t* key, size_t keylen, const uint8_t* msg,
                 size_t msglen, uint8_t out[32]);

void pbkdf2_hmac_sha256(const uint8_t* pass, size_t passlen,
                        const uint8_t* salt, size_t saltlen, uint32_t iters,
                        uint8_t* out, size_t dklen);

void hkdf_expand_sha256(const uint8_t prk[32], const uint8_t* info,
                        size_t infolen, uint8_t* out, size_t outlen);

}  // namespace stego
