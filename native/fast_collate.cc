// fast_collate: native batch assembly for the PDE data pipeline.
//
// The reference delegates its data hot path to torch's C++ DataLoader workers
// (SURVEY.md §3.5); this is the TPU-native equivalent: per-sample z-normalize
// + channel assembly + batch stacking as one OpenMP-parallel pass over
// contiguous float32 buffers, called from the Python loader via ctypes.
// At pod scale each host feeds O(1k) samples/s; doing the normalization math
// sample-by-sample in numpy costs several Python ops per channel, while this
// runs one fused pass at memory bandwidth.
//
// Build: make -C native   (produces libfast_collate.so)

#include <cstdint>
#include <cstring>

extern "C" {

// out[n] = (in[n] - mean[c]) / std[c]
// in:  N pointers to (C, H, W) float32 sample buffers
// out: (N, C, H, W) contiguous float32 batch
void collate_normalize(const float** in, float* out, int64_t n, int64_t c,
                       int64_t hw, const float* mean, const float* stdv) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const float* src = in[i];
    float* dst = out + i * c * hw;
    for (int64_t ch = 0; ch < c; ++ch) {
      const float m = mean ? mean[ch] : 0.0f;
      const float inv = stdv ? 1.0f / stdv[ch] : 1.0f;
      const float* s = src + ch * hw;
      float* d = dst + ch * hw;
      for (int64_t p = 0; p < hw; ++p) d[p] = (s[p] - m) * inv;
    }
  }
}

// Plain parallel stack (no normalization): out[i] = in[i]
void collate_stack(const float** in, float* out, int64_t n, int64_t elems) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * elems, in[i], sizeof(float) * elems);
  }
}

// Interleaved gather used by the all2all time-pair sampler when reading
// whole trajectories: out[i] = traj_buffer[index[i]] (rows of `elems` floats).
void gather_rows(const float* buf, const int64_t* index, float* out, int64_t n,
                 int64_t elems) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * elems, buf + index[i] * elems, sizeof(float) * elems);
  }
}

}  // extern "C"
