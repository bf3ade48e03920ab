// fast_collate: native batch assembly for the PDE data pipeline.
//
// The reference delegates its data hot path to torch's C++ DataLoader workers
// (SURVEY.md §3.5); this is the TPU-native equivalent: batch stacking as one
// OpenMP-parallel pass over contiguous float32 buffers, called from the
// Python loader via ctypes (poseidon_tpu/data/native.py). At pod scale each
// host feeds O(1k) samples/s; np.stack copies serially on one core, while
// this saturates memory bandwidth.
//
// Build: make -C native   (produces libfast_collate.so)

#include <cstdint>
#include <cstring>

extern "C" {

// Parallel stack: out[i] = in[i] (rows of `elems` floats)
void collate_stack(const float** in, float* out, int64_t n, int64_t elems) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * elems, in[i], sizeof(float) * elems);
  }
}

}  // extern "C"
