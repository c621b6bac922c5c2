// dsen2_host: native host-side raster kernels for the dsen2_tpu framework.
//
// The reference implements its host hot loops in Python/numpy (SURVEY.md §3,
// "hot loops ranked" #2 and #4): the per-patch extraction copy loops
// (utils/patches.py:59-72,127-144) and the mosaic recompose
// (utils/patches.py:374-405). On a full 10980x10980 L1C tile those touch
// ~10 GB of pixel data patch by patch; this library does the same work as
// threaded row-memcpys so the host side of the pipeline (dataset builders,
// archive writers, CPU fallback paths) keeps up with the TPU.
//
// Layout convention: HWC float32, row-major (the framework's host layout).
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

// Run fn(i) for i in [0, n) over a small thread pool.
template <typename F>
void parallel_for(int64_t n, F&& fn) {
  int nt = std::min<int64_t>(hw_threads(), n);
  if (nt <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&] {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : threads) th.join();
}

// Mirror an out-of-range row/col index into [0, n) with edge repetition
// (np.pad mode='symmetric' — the reference's halo padding,
// utils/patches.py:27-28).
inline int64_t fold_symmetric(int64_t i, int64_t n) {
  const int64_t period = 2 * n;
  i %= period;
  if (i < 0) i += period;
  return i < n ? i : period - 1 - i;
}

}  // namespace

extern "C" {

// dst: [h + 2*border, w + 2*border, c]
void dsen2_symmetric_pad_f32(const float* src, int64_t h, int64_t w, int64_t c,
                             int64_t border, float* dst) {
  const int64_t ph = h + 2 * border, pw = w + 2 * border;
  parallel_for(ph, [&](int64_t i) {
    const int64_t si = fold_symmetric(i - border, h);
    float* drow = dst + i * pw * c;
    const float* srow = src + si * w * c;
    // interior columns: one memcpy
    std::memcpy(drow + border * c, srow, sizeof(float) * w * c);
    for (int64_t j = 0; j < border; ++j) {
      const int64_t sj_l = fold_symmetric(j - border, w);
      const int64_t sj_r = fold_symmetric(w + j, w);
      std::memcpy(drow + j * c, srow + sj_l * c, sizeof(float) * c);
      std::memcpy(drow + (w + border + j) * c, srow + sj_r * c, sizeof(float) * c);
    }
  });
}

// img: [h, w, c] (already padded); starts: [n, 2] (row, col) offsets;
// out: [n, patch, patch, c]
void dsen2_extract_patches_f32(const float* img, int64_t h, int64_t w, int64_t c,
                               const int32_t* starts, int64_t n, int64_t patch,
                               float* out) {
  (void)h;
  parallel_for(n, [&](int64_t k) {
    const int64_t si = starts[2 * k], sj = starts[2 * k + 1];
    float* dst = out + k * patch * patch * c;
    for (int64_t r = 0; r < patch; ++r) {
      std::memcpy(dst + r * patch * c, img + ((si + r) * w + sj) * c,
                  sizeof(float) * patch * c);
    }
  });
}

// patches: [n, p, p, c]; pos: [n, 2] output (row, col) for each interior;
// out: [h, w, c]. Writes happen in patch order (last-write-wins), matching
// recompose_images (utils/patches.py:394-403). Parallelism is over output
// rows: each thread owns disjoint rows and replays the patch order, so the
// overlap semantics are preserved exactly.
void dsen2_recompose_f32(const float* patches, int64_t n, int64_t p, int64_t c,
                         int64_t border, const int32_t* pos, int64_t h, int64_t w,
                         float* out) {
  const int64_t s = p - 2 * border;
  const int nt = std::min<int64_t>(hw_threads(), h);
  const int64_t rows_per = (h + nt - 1) / nt;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&, t] {
      const int64_t r0 = t * rows_per, r1 = std::min<int64_t>(h, r0 + rows_per);
      if (r0 >= r1) return;
      for (int64_t k = 0; k < n; ++k) {
        const int64_t oy = pos[2 * k], ox = pos[2 * k + 1];
        const int64_t lo = std::max<int64_t>(oy, r0), hi = std::min<int64_t>(oy + s, r1);
        for (int64_t r = lo; r < hi; ++r) {
          const float* src =
              patches + ((k * p + (r - oy + border)) * p + border) * c;
          std::memcpy(out + (r * w + ox) * c, src, sizeof(float) * s * c);
        }
      }
    });
  }
  for (auto& th : threads) th.join();
}

// Convenience: pad + extract in one call (no intermediate padded array).
// img: [h, w, c] unpadded; starts are in PADDED coordinates.
void dsen2_pad_extract_f32(const float* img, int64_t h, int64_t w, int64_t c,
                           int64_t border, const int32_t* starts, int64_t n,
                           int64_t patch, float* out) {
  const int64_t pw = w + 2 * border;
  parallel_for(n, [&](int64_t k) {
    const int64_t si = starts[2 * k], sj = starts[2 * k + 1];
    float* dst = out + k * patch * patch * c;
    for (int64_t r = 0; r < patch; ++r) {
      const int64_t src_r = fold_symmetric(si + r - border, h);
      const float* srow = img + src_r * w * c;
      float* drow = dst + r * patch * c;
      // columns [sj, sj+patch) in padded coords -> [sj-border, ...) source
      int64_t col = sj - border;
      int64_t j = 0;
      // left fold
      for (; j < patch && col + j < 0; ++j) {
        std::memcpy(drow + j * c, srow + fold_symmetric(col + j, w) * c,
                    sizeof(float) * c);
      }
      // interior run
      const int64_t run = std::min<int64_t>(patch - j, w - (col + j));
      if (run > 0) {
        std::memcpy(drow + j * c, srow + (col + j) * c, sizeof(float) * run * c);
        j += run;
      }
      // right fold
      for (; j < patch; ++j) {
        std::memcpy(drow + j * c, srow + fold_symmetric(col + j, w) * c,
                    sizeof(float) * c);
      }
    }
  });
  (void)pw;
}

int32_t dsen2_host_abi_version() { return 1; }

}  // extern "C"
