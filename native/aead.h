// ChaCha20-Poly1305 AEAD (RFC 8439).
#pragma once

#include <cstddef>
#include <cstdint>

namespace stego {

// Out buffers are caller-provided and may alias input. `ref_compat` selects
// the reference's (buggy, self-consistent) tag serialization — required for
// interop with reference-produced images and wrapped keys; false = RFC 8439.
// Returns 0 on success.
int aead_seal(const uint8_t key[32], const uint8_t nonce[12],
              const uint8_t* aad, size_t aadlen, const uint8_t* pt, size_t len,
              uint8_t* ct_out, uint8_t tag_out[16], bool ref_compat = true);

// Returns 0 on success, -1 on authentication failure (pt_out zeroed).
int aead_open(const uint8_t key[32], const uint8_t nonce[12],
              const uint8_t* aad, size_t aadlen, const uint8_t* ct, size_t len,
              const uint8_t tag[16], uint8_t* pt_out, bool ref_compat = true);

}  // namespace stego
