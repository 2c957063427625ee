// Native host-side data-path kernels for the input pipeline.
//
// The reference's input pipeline is pure-Python numpy (SURVEY.md §2 "Dataset
// loader"); at TPU step rates the per-batch crop/flip/normalize becomes the
// host bottleneck (the compiled train step is ~10ms while a Python loop over
// 64 crops costs multiple ms and holds the GIL).  This library does the
// augmentation in parallel C++ threads, fusing crop + horizontal flip +
// uint8→float32 tanh-range normalization into one pass over the pixels.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this environment).
//
// Build: see text_to_image_tpu/data/native.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// One image: crop [y0:y0+s, x0:x0+s] from (h,w,3) uint8, optional mirror,
// normalize to [-1, 1] float32.
void one_image(const uint8_t* src, int h, int w, int s, int y0, int x0,
               bool flip, float* dst) {
  constexpr float kScale = 1.0f / 127.5f;
  for (int r = 0; r < s; ++r) {
    const uint8_t* row = src + ((y0 + r) * w + x0) * 3;
    float* out = dst + r * s * 3;
    if (!flip) {
      for (int c = 0; c < s * 3; ++c) out[c] = row[c] * kScale - 1.0f;
    } else {
      for (int c = 0; c < s; ++c) {
        const uint8_t* px = row + (s - 1 - c) * 3;
        out[c * 3 + 0] = px[0] * kScale - 1.0f;
        out[c * 3 + 1] = px[1] * kScale - 1.0f;
        out[c * 3 + 2] = px[2] * kScale - 1.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

// Gathers `n` images by index from a (num, h, w, 3) uint8 array, applies
// per-image crop origin (ys, xs) + flip, writes (n, s, s, 3) float32 in
// [-1, 1].  Parallel over images.
void crop_flip_normalize(const uint8_t* images, const int64_t* idx,
                         int64_t n, int64_t h, int64_t w, int64_t s,
                         const int32_t* ys, const int32_t* xs,
                         const uint8_t* flips, float* dst,
                         int32_t num_threads) {
  if (num_threads < 1) {
    num_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (num_threads < 1) num_threads = 1;
  }
  const int64_t img_in = h * w * 3;
  const int64_t img_out = s * s * 3;
  auto work = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      one_image(images + idx[i] * img_in, static_cast<int>(h),
                static_cast<int>(w), static_cast<int>(s), ys[i], xs[i],
                flips[i] != 0, dst + i * img_out);
    }
  };
  if (num_threads == 1 || n < 2) {
    work(0, n);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int64_t t = 0; t * chunk < n; ++t) {
    int64_t b = t * chunk;
    int64_t e = b + chunk < n ? b + chunk : n;
    pool.emplace_back(work, b, e);
  }
  for (auto& th : pool) th.join();
}

// Same gather+crop+flip but keeping uint8 (no normalization): the device
// normalizes after transfer, so the host→HBM payload is 4x smaller —
// load-bearing when the TPU is behind a low-bandwidth link.
void crop_flip_u8(const uint8_t* images, const int64_t* idx, int64_t n,
                  int64_t h, int64_t w, int64_t s, const int32_t* ys,
                  const int32_t* xs, const uint8_t* flips, uint8_t* dst,
                  int32_t num_threads) {
  if (num_threads < 1) {
    num_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (num_threads < 1) num_threads = 1;
  }
  const int64_t img_in = h * w * 3;
  const int64_t img_out = s * s * 3;
  auto work = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const uint8_t* src = images + idx[i] * img_in;
      uint8_t* out = dst + i * img_out;
      for (int64_t r = 0; r < s; ++r) {
        const uint8_t* row = src + ((ys[i] + r) * w + xs[i]) * 3;
        uint8_t* orow = out + r * s * 3;
        if (!flips[i]) {
          std::memcpy(orow, row, s * 3);
        } else {
          for (int64_t c = 0; c < s; ++c) {
            const uint8_t* px = row + (s - 1 - c) * 3;
            orow[c * 3 + 0] = px[0];
            orow[c * 3 + 1] = px[1];
            orow[c * 3 + 2] = px[2];
          }
        }
      }
    }
  };
  if (num_threads == 1 || n < 2) {
    work(0, n);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int64_t t = 0; t * chunk < n; ++t) {
    int64_t b = t * chunk;
    int64_t e = b + chunk < n ? b + chunk : n;
    pool.emplace_back(work, b, e);
  }
  for (auto& th : pool) th.join();
}

// Batched embedding gather-average: out[i] = mean over `window` picked
// captions of emb[idx[i], pick[i*window + j], :].
void gather_average_embeddings(const float* emb, int64_t num, int64_t caps,
                               int64_t dim, const int64_t* idx,
                               const int64_t* picks, int64_t n,
                               int64_t window, float* dst) {
  const float inv = 1.0f / static_cast<float>(window);
  for (int64_t i = 0; i < n; ++i) {
    float* out = dst + i * dim;
    std::memset(out, 0, sizeof(float) * dim);
    for (int64_t j = 0; j < window; ++j) {
      const float* src =
          emb + (idx[i] * caps + picks[i * window + j]) * dim;
      for (int64_t d = 0; d < dim; ++d) out[d] += src[d];
    }
    for (int64_t d = 0; d < dim; ++d) out[d] *= inv;
  }
}

}  // extern "C"
