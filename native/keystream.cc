#include "keystream.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "sha256.h"

namespace stego {
namespace {

// Counter-mode SHA-256 PRG: block i = SHA256(key || 0xAA || LE32(i)).
// (Reference struct KS, steganosaur.cpp:665-695.)
struct KeystreamPrg {
  uint8_t key[32];
  uint8_t state[32];
  int pos = 32;
  uint32_t ctr = 0;
  uint32_t bitpool = 0;
  int bits = 0;

  explicit KeystreamPrg(const uint8_t k[32]) { std::memcpy(key, k, 32); }

  inline uint8_t next_byte() {
    if (pos >= 32) {
      uint8_t block[37];
      std::memcpy(block, key, 32);
      block[32] = 0xAA;
      block[33] = uint8_t(ctr);
      block[34] = uint8_t(ctr >> 8);
      block[35] = uint8_t(ctr >> 16);
      block[36] = uint8_t(ctr >> 24);
      Sha256::hash(block, 37, state);
      pos = 0;
      ctr++;
    }
    return state[pos++];
  }

  inline int next_opcode3() {
    while (bits < 3) {
      bitpool = (bitpool << 8) | next_byte();
      bits += 8;
    }
    int op = (bitpool >> (bits - 3)) & 7;
    bits -= 3;
    return op;
  }

  inline bool hit_density(uint8_t threshold) { return next_byte() < threshold; }

  inline double jitter(double maxj) {
    int hi = next_byte();
    int lo = next_byte();
    int r = (hi << 8) | lo;
    if (r >= 0x8000) r -= 0x10000;
    return (double(r) / 32768.0) * maxj;
  }
};

inline bool on_axis(int y, int x, int H, int W) {
  return y == 0 || x == 0 || (H % 2 == 0 && y == H / 2) ||
         (W % 2 == 0 && x == W / 2);
}

}  // namespace

int64_t turtle_expand(const uint8_t walk_key[32], const uint8_t key_r[32],
                      const uint8_t key_g[32], const uint8_t key_b[32], int H,
                      int W, double rmin, double rmax, double density,
                      double jitter_max, int64_t nbits, int64_t max_steps,
                      int allow_short, int32_t* out_plane, int32_t* out_y,
                      int32_t* out_x, double* out_jitter) {
  return turtle_expand_v(walk_key, key_r, key_g, key_b, H, W, rmin, rmax,
                         density, jitter_max, nbits, max_steps, allow_short,
                         out_plane, out_y, out_x, out_jitter, nullptr,
                         nullptr);
}

int64_t turtle_expand_v(const uint8_t walk_key[32], const uint8_t key_r[32],
                        const uint8_t key_g[32], const uint8_t key_b[32],
                        int H, int W, double rmin, double rmax, double density,
                        double jitter_max, int64_t nbits, int64_t max_steps,
                        int allow_short, int32_t* out_plane, int32_t* out_y,
                        int32_t* out_x, double* out_jitter,
                        const uint64_t* init_visited, uint64_t* out_visited) {
  return turtle_expand_vc(walk_key, key_r, key_g, key_b, H, W, rmin, rmax,
                          density, jitter_max, nbits, max_steps, allow_short,
                          /*coherent=*/0, out_plane, out_y, out_x, out_jitter,
                          init_visited, out_visited);
}

int64_t turtle_expand_vc(const uint8_t walk_key[32], const uint8_t key_r[32],
                         const uint8_t key_g[32], const uint8_t key_b[32],
                         int H, int W, double rmin, double rmax,
                         double density, double jitter_max, int64_t nbits,
                         int64_t max_steps, int allow_short, int coherent,
                         int32_t* out_plane, int32_t* out_y, int32_t* out_x,
                         double* out_jitter, const uint64_t* init_visited,
                         uint64_t* out_visited) {
  KeystreamPrg ks_walk(walk_key);
  KeystreamPrg ks_planes[3] = {KeystreamPrg(key_r), KeystreamPrg(key_g),
                               KeystreamPrg(key_b)};

  // Start position: SHA256("seed:HxW|key:" || walk_key), first 8 bytes
  // big-endian (reference Turtle ctor, :762-769).
  char dims[64];
  int dlen = std::snprintf(dims, sizeof(dims), "seed:%dx%d|key:", H, W);
  uint8_t h[32];
  {
    Sha256 sh;
    sh.update(reinterpret_cast<const uint8_t*>(dims), size_t(dlen));
    sh.update(walk_key, 32);
    sh.final(h);
  }
  uint64_t s = 0;
  for (int i = 0; i < 8; ++i) s = (s << 8) | h[i];
  int y = int(s % uint64_t(H));
  int x = int((s >> 16) % uint64_t(W));
  int plane = int((s >> 32) % 3);

  // Bitset visited map: 3*H*W bits (3.1 MB at 4K vs 24.9 MB as bytes) —
  // the walk's random probes are cache-miss bound, and the 8x smaller
  // footprint keeps the hot annulus region resident in L2/LLC.
  const size_t vis_words = (size_t(3) * H * W + 63) / 64;
  std::vector<uint64_t> visited(vis_words, 0);
  if (init_visited) std::memcpy(visited.data(), init_visited, vis_words * 8);
  auto emit_visited = [&]() {
    if (out_visited) std::memcpy(out_visited, visited.data(), vis_words * 8);
  };
  auto vis1 = [&](int p, int yy, int xx) -> bool {
    size_t i = (size_t(p) * H + yy) * W + xx;
    return (visited[i >> 6] >> (i & 63)) & 1;
  };
  auto mark1 = [&](int p, int yy, int xx) {
    size_t i = (size_t(p) * H + yy) * W + xx;
    visited[i >> 6] |= uint64_t(1) << (i & 63);
  };
  // coherent (Params.coherent payload walks; pure twin _pure.turtle_expand
  // coherent=True): a written bit rotates all three planes at its (y, x)
  // site, so a site is consumed as a whole — visited checks any plane,
  // marks hit every plane.
  auto vis = [&](int p, int yy, int xx) -> bool {
    if (!coherent) return vis1(p, yy, xx);
    return vis1(0, yy, xx) || vis1(1, yy, xx) || vis1(2, yy, xx);
  };
  auto mark = [&](int p, int yy, int xx) {
    if (!coherent) { mark1(p, yy, xx); return; }
    mark1(0, yy, xx); mark1(1, yy, xx); mark1(2, yy, xx);
  };
  const double rlo = rmin * (H < W ? H : W);
  const double rhi = rmax * (H < W ? H : W);
  const uint8_t dens_thresh = uint8_t(int(std::floor(density * 256.0)) & 0xFF);

  // Annulus test, hot-path form. The reference compares r = hypot(y, x)
  // (:793); y^2 + x^2 is an exact integer (< 2^26), so comparing squares is
  // exact as reals — but hypot's final rounding could flip a comparison in a
  // ~1-ulp shell around each radius. Integer bands with a generous relative
  // guard decide everything except that shell, where we defer to hypot so
  // accept decisions stay bit-identical to the reference/python oracle.
  // This removes a libm call from ~91% of steps at 4K (the annulus covers
  // only ~9% of bins).
  const double rlo2 = rlo * rlo, rhi2 = rhi * rhi;
  const int64_t rlo2_lo = int64_t(rlo2 * (1.0 - 1e-9)) - 1;
  const int64_t rlo2_hi = int64_t(rlo2 * (1.0 + 1e-9)) + 1;
  const int64_t rhi2_lo = int64_t(rhi2 * (1.0 - 1e-9)) - 1;
  const int64_t rhi2_hi = int64_t(rhi2 * (1.0 + 1e-9)) + 1;
  auto annulus_ok = [&](int yy, int xx) -> bool {
    int64_t s = int64_t(yy) * yy + int64_t(xx) * xx;
    if (s < rlo2_lo || s > rhi2_hi) return false;
    if (s > rlo2_hi && s < rhi2_lo) return true;
    double r = std::hypot(double(yy), double(xx));
    return r >= rlo && r <= rhi;
  };

  // On exhaustion with allow_short: pad remaining slots with the last valid
  // bin so downstream gathers index real memory; callers slice by true count.
  auto pad_from = [&](int64_t i) -> int64_t {
    int32_t lp = 0, ly = 1, lx = 1;  // safe dummy bin if nothing was produced
    if (i > 0) { lp = out_plane[i - 1]; ly = out_y[i - 1]; lx = out_x[i - 1]; }
    for (int64_t k = i; k < nbits; ++k) {
      out_plane[k] = lp; out_y[k] = ly; out_x[k] = lx; out_jitter[k] = 0.0;
    }
    return i;
  };

  int64_t steps = 0;
  for (int64_t i = 0; i < nbits; ++i) {
    for (;;) {  // candidate loop: advance_to_valid + density Bernoulli
      for (;;) {  // advance_to_valid (reference :778-804)
        if (++steps > max_steps) {
          if (!allow_short) return -1;
          int64_t n = pad_from(i);
          emit_visited();
          return n;
        }
        switch (ks_walk.next_opcode3()) {
          case 0: plane = (plane + 1) % 3; break;
          case 1: x = (x + 1) % W; break;
          case 2: y = (y + 1) % H; break;
          case 3: x = (x - 1 + W) % W; break;
          case 4: y = (y - 1 + H) % H; break;
          case 5: x = (x + 1) % W; y = (y + 1) % H; break;
          case 6: x = (x - 1 + W) % W; y = (y + 1) % H; break;
          default: break;  // 7: stay
        }
        // Pure-rejection predicates: evaluation order is free (no keystream
        // side effects), so the memory-free checks run first — the annulus
        // rejects ~91% of steps at 4K before the visited array (24.9 MB at
        // 4K, random access = cache miss) is ever touched.
        if (on_axis(y, x, H, W)) continue;
        if (y == 0 && x == 0) continue;
        if (!annulus_ok(y, x)) continue;
        if (vis(plane, y, x)) continue;
        // magnitude check intentionally disabled (reference :797-799)
        int cy = (y == 0) ? 0 : (H - y) % H;
        int cx = (x == 0) ? 0 : (W - x) % W;
        if (vis(plane, cy, cx)) continue;
        break;
      }
      if (ks_walk.hit_density(dens_thresh)) break;
      // density skip: mark used-but-empty (reference :1079-1080)
      mark(plane, y, x);
      int cy = (y == 0) ? 0 : (H - y) % H;
      int cx = (x == 0) ? 0 : (W - x) % W;
      mark(plane, cy, cx);
    }
    out_plane[i] = plane;
    out_y[i] = y;
    out_x[i] = x;
    out_jitter[i] = ks_planes[plane].jitter(jitter_max);
    mark(plane, y, x);
    int cy = (y == 0) ? 0 : (H - y) % H;
    int cx = (x == 0) ? 0 : (W - x) % W;
    mark(plane, cy, cx);
  }
  emit_visited();
  return nbits;
}

}  // namespace stego
