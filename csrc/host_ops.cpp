// host_ops: native host-side kernels for the paradis_tpu data runtime.
//
// The training-input pipeline (zarr chunk decode + normalization) runs on the
// host while the TPU computes; these kernels keep it off the Python
// interpreter: batched zlib inflation and fused z-score normalization, both
// multithreaded and GIL-free (callers hold no Python state).  Bound via
// ctypes from paradis_tpu/data/native.py; the Python implementations remain
// as the fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC host_ops.cpp -o libparadis_host.so -lz

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Inflate n zlib streams into a contiguous destination of n fixed-size chunks.
// srcs[i] may be null => chunk filled with fill_byte-initialized zeros pattern
// is left untouched (caller pre-fills).  Returns 0 on success, else the index
// of the first failing chunk + 1.
int zlib_decode_many(const uint8_t* const* srcs, const int64_t* src_lens,
                     uint8_t* dst, int64_t chunk_bytes, int n, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failed(0);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      if (srcs[i] == nullptr) continue;  // missing chunk: caller pre-filled
      uLongf out_len = static_cast<uLongf>(chunk_bytes);
      int rc = uncompress(dst + static_cast<int64_t>(i) * chunk_bytes, &out_len,
                          srcs[i], static_cast<uLong>(src_lens[i]));
      if (rc != Z_OK || out_len != static_cast<uLongf>(chunk_bytes)) {
        failed.store(i + 1);
        return;
      }
    }
  };

  int threads = n_threads > 0 ? n_threads : 1;
  if (threads == 1 || n == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failed.load();
}

// Fused z-score normalization over a channels-last array:
//   data[p, c] = (data[p, c] - mean[idx[c]]) / std[idx[c]]  for c in idx set.
// `channels` is the trailing dimension; `idx` selects which channels to
// normalize with which statistic row (idx_len entries of (channel, stat_row)).
void zscore_normalize_inplace(float* data, int64_t n_px, int64_t channels,
                              const int64_t* chan_idx, const float* mean,
                              const float* stddev, int64_t idx_len,
                              int n_threads) {
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t p = lo; p < hi; ++p) {
      float* row = data + p * channels;
      for (int64_t k = 0; k < idx_len; ++k) {
        const int64_t c = chan_idx[k];
        row[c] = (row[c] - mean[k]) / stddev[k];
      }
    }
  };
  int threads = n_threads > 0 ? n_threads : 1;
  if (threads == 1) {
    work(0, n_px);
    return;
  }
  std::vector<std::thread> pool;
  int64_t per = (n_px + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * per;
    int64_t hi = lo + per < n_px ? lo + per : n_px;
    if (lo >= hi) break;
    pool.emplace_back(work, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// BitRound: drop low mantissa bits of float32 with round-to-nearest
// (numcodecs-compatible; used by the forecast writer's encoding).
void bitround_inplace(uint32_t* bits, int64_t n, int keepbits) {
  const int drop = 23 - keepbits;
  if (drop <= 0) return;
  const uint32_t half = 1u << (drop - 1);
  const uint32_t mask = ~((1u << drop) - 1u);
  for (int64_t i = 0; i < n; ++i) {
    bits[i] = (bits[i] + half) & mask;
  }
}

}  // extern "C"
