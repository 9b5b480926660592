// Native host codec hot loops — lane-major packed-group (LMP) layout.
//
// The TPU-native analog of libgiddy's host-side packed-int facilities
// (upstream src/util/integer.h + the encode path the library leaves to the
// host — SURVEY.md §1 "decode-only", §3.9). The NumPy reference in
// giddy_tpu/ref/lmp.py is normative; this file must match it bit-for-bit
// (tests/test_native.py enforces parity). Used to encode multi-GiB columns
// at memory speed instead of 32 vectorized NumPy passes.
//
// Layout (FORMAT.md §0.1): group g, lane c, slot i; value v[g*32768+i*1024+c]
// occupies bits [i*B, (i+1)*B) of lane c's little-endian 32*B-bit buffer;
// word w of the group is packed[g][w*1024 + c].

#include <cstdint>
#include <cstring>

namespace {
constexpr int64_t LANES = 1024;
constexpr int64_t SLOTS = 32;
constexpr int64_t GROUP = LANES * SLOTS;
}  // namespace

extern "C" {

// words must be zero-initialized by the caller; v has ng*GROUP values.
void lmp_pack_u32(const uint32_t* v, uint32_t* words, int64_t ng, int bits) {
#pragma omp parallel for schedule(static)
  for (int64_t g = 0; g < ng; ++g) {
    const uint32_t* vg = v + g * GROUP;
    uint32_t* wg = words + g * (int64_t)bits * LANES;
    for (int i = 0; i < SLOTS; ++i) {
      const int64_t bit = (int64_t)i * bits;
      const int w0 = (int)(bit / 32), s = (int)(bit % 32);
      const uint32_t* row = vg + (int64_t)i * LANES;
      uint32_t* lo = wg + (int64_t)w0 * LANES;
      if (s + bits > 32) {
        uint32_t* hi = lo + LANES;
        for (int64_t c = 0; c < LANES; ++c) {
          lo[c] |= row[c] << s;
          hi[c] |= row[c] >> (32 - s);
        }
      } else if (s) {
        for (int64_t c = 0; c < LANES; ++c) lo[c] |= row[c] << s;
      } else {
        for (int64_t c = 0; c < LANES; ++c) lo[c] |= row[c];
      }
    }
  }
}

void lmp_unpack_u32(const uint32_t* words, uint32_t* v, int64_t ng, int bits) {
  const uint32_t mask = bits == 32 ? 0xFFFFFFFFu : ((1u << bits) - 1u);
#pragma omp parallel for schedule(static)
  for (int64_t g = 0; g < ng; ++g) {
    const uint32_t* wg = words + g * (int64_t)bits * LANES;
    uint32_t* vg = v + g * GROUP;
    for (int i = 0; i < SLOTS; ++i) {
      const int64_t bit = (int64_t)i * bits;
      const int w0 = (int)(bit / 32), s = (int)(bit % 32);
      const uint32_t* lo = wg + (int64_t)w0 * LANES;
      uint32_t* row = vg + (int64_t)i * LANES;
      if (s + bits > 32) {
        const uint32_t* hi = lo + LANES;
        for (int64_t c = 0; c < LANES; ++c)
          row[c] = ((lo[c] >> s) | (hi[c] << (32 - s))) & mask;
      } else if (s) {
        for (int64_t c = 0; c < LANES; ++c) row[c] = (lo[c] >> s) & mask;
      } else {
        for (int64_t c = 0; c < LANES; ++c) row[c] = lo[c] & mask;
      }
    }
  }
}

// ZigZag helpers (FORMAT.md §0.2) for the delta/model encode hot path.
void zigzag_i32(const int32_t* d, uint32_t* z, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    z[i] = ((uint32_t)d[i] << 1) ^ (uint32_t)(d[i] >> 31);
}

void unzigzag_u32(const uint32_t* z, int32_t* d, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    d[i] = (int32_t)((z[i] >> 1) ^ (~(z[i] & 1u) + 1u));
}

}  // extern "C"
