// Native host-side batch assembly for the data pipeline.
//
// The reference delegates its host data path to torch DataLoader workers
// (/root/reference/data/dataset.py); this framework's pipeline is
// vectorized host code feeding a jitted device loop, and the hot inner op —
// gather selected images, convert uint8 -> fp32 [0,1], optional horizontal
// flip, assemble the contiguous NHWC batch — is implemented here in C++
// (multithreaded, single pass over the output) and bound via ctypes
// (nfdpm_tpu/data/native.py). A numpy fallback exists when the shared
// library is absent.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// images:  [n, h, w, c] uint8, contiguous
// indices: [b] int64 rows to gather
// flips:   [b] uint8 (1 => mirror along w), may be null
// out:     [b, h, w, c] float32, contiguous
void batch_gather_normalize(const uint8_t* images, int64_t n, int64_t h,
                            int64_t w, int64_t c, const int64_t* indices,
                            const uint8_t* flips, int64_t b, float* out,
                            int64_t n_threads) {
  const int64_t img_elems = h * w * c;
  const float inv255 = 1.0f / 255.0f;
  if (n_threads <= 0) {
    n_threads = std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > b) n_threads = b;

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= b) break;
      const uint8_t* src = images + indices[i] * img_elems;
      float* dst = out + i * img_elems;
      const bool flip = flips != nullptr && flips[i] != 0;
      if (!flip) {
        for (int64_t e = 0; e < img_elems; ++e) dst[e] = src[e] * inv255;
      } else {
        for (int64_t y = 0; y < h; ++y) {
          const uint8_t* row = src + y * w * c;
          float* orow = dst + y * w * c;
          for (int64_t x = 0; x < w; ++x) {
            const uint8_t* px = row + (w - 1 - x) * c;
            float* opx = orow + x * c;
            for (int64_t ch = 0; ch < c; ++ch) opx[ch] = px[ch] * inv255;
          }
        }
      }
    }
  };

  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// In-place 5-bit-style quantization preprocess on a float [0,1] batch:
//   y = floor(255*x / 2^(8-bits)) / 2^bits - 0.5
// (host-side mirror of ops/quantize.preprocess for pipelines that want the
// work off the accelerator; the device path remains the default).
void preprocess_nbits(float* data, int64_t elems, int64_t n_bits) {
  const float denom = static_cast<float>(1 << (8 - n_bits));
  const float bins = static_cast<float>(1 << n_bits);
  for (int64_t e = 0; e < elems; ++e) {
    float v = data[e] * 255.0f;
    if (n_bits < 8) v = std::floor(v / denom);
    data[e] = v / bins - 0.5f;
  }
}

}  // extern "C"
