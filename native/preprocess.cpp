// Native host-side preprocessing kernels for the data pipeline.
//
// The data hot path (SURVEY.md §3.4) is per-sample image undistortion +
// decode + normalization. The reference leans on OpenCV's C++ through
// Python bindings per call (dataset/void_dataset_v3.py:43-50); here the
// remap/normalize/crop inner loops are a small dependency-free C++ library
// driven through ctypes, with row-parallel std::thread execution so one
// loader thread can saturate multiple cores during batch assembly.
//
// Semantics match cv2.remap(..., INTER_LINEAR, BORDER_CONSTANT=0):
// bilinear sampling on float32 maps, out-of-range taps contribute 0.
//
// Build: g++ -O3 -march=native -fPIC -shared -pthread preprocess.cpp -o libmmde_preprocess.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

template <typename T>
inline void remap_rows(const T* src, int h, int w, int ch, const float* mapx,
                       const float* mapy, T* dst, int oh, int ow, int row0,
                       int row1) {
  for (int y = row0; y < row1; ++y) {
    for (int x = 0; x < ow; ++x) {
      const float fx = mapx[y * ow + x];
      const float fy = mapy[y * ow + x];
      const int x0 = static_cast<int>(std::floor(fx));
      const int y0 = static_cast<int>(std::floor(fy));
      const float ax = fx - x0;
      const float ay = fy - y0;
      for (int c = 0; c < ch; ++c) {
        float acc = 0.f;
        // 4 taps; out-of-bounds taps contribute 0 (BORDER_CONSTANT)
        const int xs[2] = {x0, x0 + 1};
        const int ys[2] = {y0, y0 + 1};
        const float wx[2] = {1.f - ax, ax};
        const float wy[2] = {1.f - ay, ay};
        for (int j = 0; j < 2; ++j) {
          if (ys[j] < 0 || ys[j] >= h) continue;
          for (int i = 0; i < 2; ++i) {
            if (xs[i] < 0 || xs[i] >= w) continue;
            acc += wy[j] * wx[i] *
                   static_cast<float>(src[(ys[j] * w + xs[i]) * ch + c]);
          }
        }
        if (std::is_integral<T>::value) {
          acc = std::round(acc);
          acc = std::max(0.f, std::min(acc, 255.f));
        }
        dst[(y * ow + x) * ch + c] = static_cast<T>(acc);
      }
    }
  }
}

template <typename Fn>
void parallel_rows(int rows, int n_threads, Fn&& fn) {
  if (n_threads <= 1 || rows < 64) {
    fn(0, rows);
    return;
  }
  std::vector<std::thread> pool;
  const int chunk = (rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int r0 = t * chunk;
    const int r1 = std::min(rows, r0 + chunk);
    if (r0 >= r1) break;
    pool.emplace_back([=, &fn] { fn(r0, r1); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Bilinear remap, uint8 interleaved channels.
void mmde_remap_u8(const uint8_t* src, int h, int w, int ch,
                   const float* mapx, const float* mapy, uint8_t* dst,
                   int oh, int ow, int n_threads) {
  parallel_rows(oh, n_threads, [&](int r0, int r1) {
    remap_rows<uint8_t>(src, h, w, ch, mapx, mapy, dst, oh, ow, r0, r1);
  });
}

// Bilinear remap, float32 single channel (depth maps).
void mmde_remap_f32(const float* src, int h, int w, const float* mapx,
                    const float* mapy, float* dst, int oh, int ow,
                    int n_threads) {
  parallel_rows(oh, n_threads, [&](int r0, int r1) {
    remap_rows<float>(src, h, w, 1, mapx, mapy, dst, oh, ow, r0, r1);
  });
}

// uint8 HWC -> float32 HWC / 255, with optional crop (top/left, out dims).
void mmde_normalize_crop_u8(const uint8_t* src, int h, int w, int ch,
                            int top, int left, int oh, int ow, float* dst,
                            int n_threads) {
  (void)h;
  parallel_rows(oh, n_threads, [&](int r0, int r1) {
    constexpr float kInv = 1.0f / 255.0f;
    for (int y = r0; y < r1; ++y) {
      const uint8_t* srow = src + ((top + y) * w + left) * ch;
      float* drow = dst + y * ow * ch;
      const int n = ow * ch;
      for (int i = 0; i < n; ++i) drow[i] = srow[i] * kInv;
    }
  });
}

// 16-bit depth PNG payload -> meters: v / 256 / 1000 (VOID convention).
void mmde_depth_u16_to_m(const uint16_t* src, int n, float* dst,
                         int n_threads) {
  parallel_rows(n, n_threads, [&](int r0, int r1) {
    constexpr float kScale = 1.0f / (256.0f * 1000.0f);
    for (int i = r0; i < r1; ++i) dst[i] = src[i] * kScale;
  });
}

}  // extern "C"
