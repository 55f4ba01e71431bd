// pcm_native: host-side data-path kernels for pointcloudmatters_tpu.
//
// The reference delegates its host runtime to torch's C++ DataLoader; our
// loader is Python threads + numpy, whose one hot loop is voxel-grid
// subsampling (FNV hash -> argsort -> segment -> pick, reference
// `transformpcd.py:662-793`). This file fuses that pipeline into a single
// OpenMP-parallel C++ pass, exposed over a minimal C ABI consumed via
// ctypes (no pybind11 in the image). Compiled on demand by
// `pointcloudmatters_tpu/data/native.py`; everything falls back to numpy
// when no toolchain is present.

#include <algorithm>
#include <parallel/algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <random>
#include <vector>

extern "C" {

// FNV64-1A over integer coordinate rows (matches numpy fnv_hash_vec,
// including its uint64 wrap-around semantics).
void pcm_fnv_hash(const int64_t* coords, int64_t n, int64_t d,
                  uint64_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    uint64_t h = 14695981039346656037ULL;
    for (int64_t j = 0; j < d; ++j) {
      h *= 1099511628211ULL;
      h ^= static_cast<uint64_t>(coords[i * d + j]);
    }
    out[i] = h;
  }
}

// Stable argsort of uint64 keys: LSD radix (8 passes x 8 bits) — several
// times faster than comparison sort for the 10k-1M key range the voxel
// pipeline sees, and stable by construction.
void pcm_argsort_u64(const uint64_t* keys, int64_t n, int64_t* order) {
  std::iota(order, order + n, 0);
  std::vector<int64_t> tmp(n);
  int64_t* src = order;
  int64_t* dst = tmp.data();
  for (int pass = 0; pass < 8; ++pass) {
    const int shift = pass * 8;
    // skip passes whose byte is constant across all keys
    uint64_t first_byte = (keys[src[0]] >> shift) & 0xFF;
    bool constant = true;
    int64_t counts[256] = {0};
    for (int64_t i = 0; i < n; ++i) {
      const uint64_t b = (keys[src[i]] >> shift) & 0xFF;
      constant &= (b == first_byte);
      ++counts[b];
    }
    if (constant) continue;
    int64_t offsets[256];
    int64_t total = 0;
    for (int b = 0; b < 256; ++b) {
      offsets[b] = total;
      total += counts[b];
    }
    for (int64_t i = 0; i < n; ++i) {
      const uint64_t b = (keys[src[i]] >> shift) & 0xFF;
      dst[offsets[b]++] = src[i];
    }
    std::swap(src, dst);
  }
  if (src != order) std::memcpy(order, src, n * sizeof(int64_t));
}

// Fused train-mode voxel subsample: hash rows, argsort, find segments,
// pick one random point per voxel (pick = U[0, max_count) % count, the
// reference's distribution). Returns the number of voxels; idx_out must
// have capacity n. grid_coord rows are the *deduplicated* selections'
// original indices.
int64_t pcm_grid_subsample_train(const int64_t* coords, int64_t n, int64_t d,
                                 uint64_t seed, int64_t* idx_out) {
  std::vector<uint64_t> keys(n);
  pcm_fnv_hash(coords, n, d, keys.data());
  std::vector<int64_t> order(n);
  pcm_argsort_u64(keys.data(), n, order.data());

  // segment boundaries over sorted keys
  std::vector<int64_t> starts;
  starts.reserve(n / 4 + 1);
  int64_t max_count = 0;
  {
    int64_t seg_start = 0;
    for (int64_t i = 1; i <= n; ++i) {
      if (i == n || keys[order[i]] != keys[order[seg_start]]) {
        starts.push_back(seg_start);
        max_count = std::max(max_count, i - seg_start);
        seg_start = i;
      }
    }
  }
  const int64_t n_voxels = static_cast<int64_t>(starts.size());
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int64_t> dist(
      0, max_count > 0 ? max_count - 1 : 0);
  for (int64_t v = 0; v < n_voxels; ++v) {
    const int64_t begin = starts[v];
    const int64_t end = (v + 1 < n_voxels) ? starts[v + 1] : n;
    const int64_t count = end - begin;
    idx_out[v] = order[begin + dist(rng) % count];
  }
  // ascending original order is not required by the reference (it keeps
  // hash order); we keep hash-sorted voxel order for determinism.
  return n_voxels;
}

// Test-mode partition sizes: returns n_voxels and writes per-voxel segment
// starts/counts (capacity n each) over the sorted order (also written).
int64_t pcm_grid_segments(const int64_t* coords, int64_t n, int64_t d,
                          int64_t* order_out, int64_t* starts_out,
                          int64_t* counts_out) {
  std::vector<uint64_t> keys(n);
  pcm_fnv_hash(coords, n, d, keys.data());
  pcm_argsort_u64(keys.data(), n, order_out);
  int64_t n_voxels = 0;
  int64_t seg_start = 0;
  for (int64_t i = 1; i <= n; ++i) {
    if (i == n || keys[order_out[i]] != keys[order_out[seg_start]]) {
      starts_out[n_voxels] = seg_start;
      counts_out[n_voxels] = i - seg_start;
      ++n_voxels;
      seg_start = i;
    }
  }
  return n_voxels;
}

}  // extern "C"
