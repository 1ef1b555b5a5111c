// Native batch-assembly kernels for the host input pipeline.
//
// The reference feeds its GPU through torch DataLoader workers
// (ref /root/reference/Code/ir_colorization.py:1576-1581); the Python-level
// cost there is image decode (cv2, native already) plus the per-sample
// uint8→float32 normalize / flip / stack, which in pure numpy is
// GIL-serialized per sample. These kernels fuse normalize+flip+stack into
// one multithreaded pass writing directly into the pinned batch buffer.
//
// Exposed via ctypes (no pybind11 in this environment); see
// ircolor_tpu/data/native.py. Built with: g++ -O3 -shared -fPIC.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Normalize one HxWxC uint8 image into dst as float32 in [-1, 1]
// (x/255*2-1), optionally flipping horizontally (paired-augmentation flip,
// ref :1165-1167).
void normalize_one(const uint8_t* src, float* dst, int h, int w, int c,
                   bool flip) {
  const float scale = 2.0f / 255.0f;
  if (!flip) {
    const int64_t n = static_cast<int64_t>(h) * w * c;
    for (int64_t i = 0; i < n; ++i) {
      dst[i] = static_cast<float>(src[i]) * scale - 1.0f;
    }
    return;
  }
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + static_cast<int64_t>(y) * w * c;
    float* drow = dst + static_cast<int64_t>(y) * w * c;
    for (int x = 0; x < w; ++x) {
      const uint8_t* sp = srow + static_cast<int64_t>(w - 1 - x) * c;
      float* dp = drow + static_cast<int64_t>(x) * c;
      for (int ch = 0; ch < c; ++ch) {
        dp[ch] = static_cast<float>(sp[ch]) * scale - 1.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

// srcs: array of B pointers to HxWxC uint8 images (contiguous).
// flips: B bytes, nonzero = horizontal flip.
// dst: B*H*W*C float32 output (NHWC batch), normalized to [-1, 1].
void assemble_batch_u8(const uint8_t** srcs, const uint8_t* flips, float* dst,
                       int b, int h, int w, int c, int nthreads) {
  if (nthreads < 1) nthreads = 1;
  if (nthreads > b) nthreads = b;
  const int64_t stride = static_cast<int64_t>(h) * w * c;
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    pool.emplace_back([=]() {
      for (int i = t; i < b; i += nthreads) {
        normalize_one(srcs[i], dst + static_cast<int64_t>(i) * stride, h, w, c,
                      flips[i] != 0);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// Flat uint8 buffer → float32 with y = x*scale + offset (multithreaded).
void u8_to_f32_affine(const uint8_t* src, float* dst, int64_t n, float scale,
                      float offset, int nthreads) {
  if (nthreads < 1) nthreads = 1;
  const int64_t chunk = (n + nthreads - 1) / nthreads;
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        dst[i] = static_cast<float>(src[i]) * scale + offset;
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
