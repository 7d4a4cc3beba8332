// Native brute-force Hamming matcher for the CPU execution path.
//
// Replicates the reference's matchDescriptors semantics exactly
// (include/visnav/keypoints.h:223-278 — best/second-best with threshold,
// ratio test, mutual cross-check) over packed 256-bit descriptors, the
// same contract as features/match.py's XLA path (ties broken toward the
// lower index, matching argmin).  The reference runs this under a TBB
// parallel_for on all cores (src/sfm.cpp:1294-1319); here a std::thread
// pool with an atomic work index plays that role.
//
// Per pair the (F x F) distance matrix is computed once — the XOR+popcount
// fill loop auto-vectorises (AVX-512 VPOPCNTDQ where available with
// -march=native) — then matched by row scans (left->right) and column
// scans (right->left) with mutual cross-check.
//
// Built on demand with g++ -O3 -march=native and loaded via ctypes
// (features/native_match.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int32_t kBig = 1 << 20;

inline void scan_one_way(const uint16_t* dist, int64_t F, int64_t stride,
                         const uint8_t* v1, const uint8_t* v2,
                         int32_t threshold, double ratio, int32_t* out) {
  for (int64_t i = 0; i < F; ++i) {
    out[i] = -1;
    if (!v1[i]) continue;
    const uint16_t* row = dist + stride * i;
    int32_t b1 = kBig, b2 = kBig, bi = -1;
    for (int64_t j = 0; j < F; ++j) {
      if (!v2[j]) continue;
      int32_t d = row[j];
      if (d < b1) {
        b2 = b1;
        b1 = d;
        bi = (int32_t)j;
      } else if (d < b2) {
        b2 = d;
      }
    }
    if (bi >= 0 && b1 < threshold && (double)b2 >= (double)b1 * ratio) {
      out[i] = bi;
    }
  }
}

}  // namespace

extern "C" void match_pairs_hamming(
    int64_t P, int64_t F,
    const uint64_t* desc,   // (I, F, 4) packed 256-bit descriptors
    const uint8_t* valid,   // (I, F)
    const int32_t* pa,      // (P,) first image index per pair
    const int32_t* pb,      // (P,) second image index per pair
    int32_t threshold, double ratio, int32_t n_threads,
    int32_t* out) {         // (P, F): index into image b's features or -1
  std::atomic<int64_t> next(0);
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads > P) n_threads = (int32_t)(P > 0 ? P : 1);

  auto worker = [&]() {
    std::vector<uint16_t> dist((size_t)F * F);
    std::vector<uint16_t> dist_t((size_t)F * F);  // transposed
    std::vector<int32_t> m21(F);
    for (;;) {
      int64_t p = next.fetch_add(1);
      if (p >= P) break;
      const uint64_t* d1 = desc + 4 * F * (int64_t)pa[p];
      const uint64_t* d2 = desc + 4 * F * (int64_t)pb[p];
      const uint8_t* v1 = valid + F * (int64_t)pa[p];
      const uint8_t* v2 = valid + F * (int64_t)pb[p];
      for (int64_t i = 0; i < F; ++i) {
        const uint64_t a0 = d1[4 * i], a1 = d1[4 * i + 1];
        const uint64_t a2 = d1[4 * i + 2], a3 = d1[4 * i + 3];
        uint16_t* row = dist.data() + (size_t)F * i;
        for (int64_t j = 0; j < F; ++j) {  // auto-vectorised
          const uint64_t* r = d2 + 4 * j;
          row[j] = (uint16_t)(__builtin_popcountll(a0 ^ r[0]) +
                              __builtin_popcountll(a1 ^ r[1]) +
                              __builtin_popcountll(a2 ^ r[2]) +
                              __builtin_popcountll(a3 ^ r[3]));
        }
      }
      // transpose for cache-friendly right->left scans
      for (int64_t i = 0; i < F; ++i)
        for (int64_t j = 0; j < F; ++j)
          dist_t[(size_t)F * j + i] = dist[(size_t)F * i + j];

      int32_t* m12 = out + F * p;
      scan_one_way(dist.data(), F, F, v1, v2, threshold, ratio, m12);
      scan_one_way(dist_t.data(), F, F, v2, v1, threshold, ratio, m21.data());
      for (int64_t i = 0; i < F; ++i) {
        if (m12[i] >= 0 && m21[m12[i]] != (int32_t)i) m12[i] = -1;
      }
    }
  };

  std::vector<std::thread> pool;
  for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}
