// moondream-tpu native host preprocessing.
//
// Role: the reference's host-side image pipeline leans on native code via
// pyvips/libvips when present (reference moondream/torch/image_crops.py:
// 124-136) and otherwise falls back to PIL. This library is the in-repo
// native equivalent: a multithreaded, bit-exact reimplementation of PIL's
// fixed-point Lanczos-3 resampler plus the full overlap-crop pipeline
// (global resize + grid resize + tile extraction) in one call, so the
// Python host path does a single ctypes call per image instead of N PIL
// round-trips.
//
// Bit-exactness contract: output matches PIL.Image.resize(..., LANCZOS)
// byte-for-byte for uint8 RGB/unichannel inputs (PIL's two-pass separable
// resampling with PRECISION_BITS fixed-point accumulation and uint8
// intermediate quantization). Verified by tests/test_native_preprocess.py.
//
// Build: make -C native   (g++ -O3 -shared; no external dependencies)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // PIL's PRECISION_BITS
constexpr double kLanczosSupport = 3.0;

inline double sinc(double x) {
  if (x == 0.0) return 1.0;
  const double pix = M_PI * x;
  return std::sin(pix) / pix;
}

inline double lanczos3(double x) {
  if (x <= -kLanczosSupport || x >= kLanczosSupport) return 0.0;
  return sinc(x) * sinc(x / kLanczosSupport);
}

// int32 accumulation is safe: normalized taps sum to ~1.0 in fixed point
// (|sum| a few times 2^22 with Lanczos negative lobes), so |acc| stays well
// under 2^31 for uint8 pixels — the same bound PIL's int32 path relies on.
inline uint8_t clip8(int32_t v) {
  v >>= kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<uint8_t>(v);
}

// Precomputed fixed-point filter taps for one resampling axis (PIL's
// precompute_coeffs).
struct AxisCoeffs {
  int ksize;                  // max taps per output pixel
  std::vector<int> bounds;    // (xmin, xcount) per output pixel
  std::vector<int> kk;        // ksize taps per output pixel
};

AxisCoeffs precompute(int in_size, int out_size) {
  AxisCoeffs c;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = kLanczosSupport * filterscale;
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  c.ksize = ksize;
  c.bounds.resize(2 * out_size);
  c.kk.resize(static_cast<size_t>(out_size) * ksize, 0);
  std::vector<double> w(ksize);

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    double ww = 0.0;
    const double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;

    for (int x = 0; x < xmax; ++x) {
      const double val = lanczos3((x + xmin - center + 0.5) * ss);
      w[x] = val;
      ww += val;
    }
    for (int x = 0; x < xmax; ++x) {
      if (ww != 0.0) w[x] /= ww;
      const double fixed = w[x] * (1 << kPrecisionBits);
      c.kk[static_cast<size_t>(xx) * ksize + x] =
          static_cast<int>(fixed < 0 ? fixed - 0.5 : fixed + 0.5);
    }
    c.bounds[2 * xx] = xmin;
    c.bounds[2 * xx + 1] = xmax;
  }
  return c;
}

void parallel_rows(int n_rows, int n_threads,
                   const std::function<void(int, int)>& fn) {
  if (n_threads <= 1 || n_rows < 64) {
    fn(0, n_rows);
    return;
  }
  const int chunk = (n_rows + n_threads - 1) / n_threads;
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) {
    const int lo = t * chunk;
    const int hi = std::min(n_rows, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& th : ts) th.join();
}

// Horizontal pass: (h, in_w, ch) -> (h, out_w, ch), uint8 intermediate.
void resample_horizontal(const uint8_t* src, int h, int in_w, int ch,
                         uint8_t* dst, int out_w, const AxisCoeffs& c,
                         int n_threads) {
  parallel_rows(h, n_threads, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      const uint8_t* row = src + static_cast<size_t>(y) * in_w * ch;
      uint8_t* out = dst + static_cast<size_t>(y) * out_w * ch;
      for (int xx = 0; xx < out_w; ++xx) {
        const int xmin = c.bounds[2 * xx];
        const int xcount = c.bounds[2 * xx + 1];
        const int* k = &c.kk[static_cast<size_t>(xx) * c.ksize];
        if (ch == 3) {  // hot case: RGB, three accumulators in registers
          int32_t s0 = 1 << (kPrecisionBits - 1), s1 = s0, s2 = s0;
          const uint8_t* p = row + xmin * 3;
          for (int x = 0; x < xcount; ++x, p += 3) {
            const int32_t kx = k[x];
            s0 += p[0] * kx;
            s1 += p[1] * kx;
            s2 += p[2] * kx;
          }
          out[xx * 3 + 0] = clip8(s0);
          out[xx * 3 + 1] = clip8(s1);
          out[xx * 3 + 2] = clip8(s2);
        } else {
          for (int b = 0; b < ch; ++b) {
            int32_t ss = 1 << (kPrecisionBits - 1);
            for (int x = 0; x < xcount; ++x)
              ss += row[(xmin + x) * ch + b] * k[x];
            out[xx * ch + b] = clip8(ss);
          }
        }
      }
    }
  });
}

// Vertical pass: (in_h, w, ch) -> (out_h, w, ch).
void resample_vertical(const uint8_t* src, int in_h, int w, int ch,
                       uint8_t* dst, int out_h, const AxisCoeffs& c,
                       int n_threads) {
  parallel_rows(out_h, n_threads, [&](int y0, int y1) {
    const int row_len = w * ch;
    std::vector<int32_t> acc(row_len);
    for (int yy = y0; yy < y1; ++yy) {
      const int ymin = c.bounds[2 * yy];
      const int ycount = c.bounds[2 * yy + 1];
      const int* k = &c.kk[static_cast<size_t>(yy) * c.ksize];
      uint8_t* out = dst + static_cast<size_t>(yy) * row_len;
      // contiguous accumulate row-by-row: auto-vectorizes
      std::fill(acc.begin(), acc.end(), 1 << (kPrecisionBits - 1));
      for (int y = 0; y < ycount; ++y) {
        const uint8_t* row = src + static_cast<size_t>(ymin + y) * row_len;
        const int32_t ky = k[y];
        for (int x = 0; x < row_len; ++x) acc[x] += row[x] * ky;
      }
      for (int x = 0; x < row_len; ++x) out[x] = clip8(acc[x]);
    }
  });
}

int hw_threads() {
  const unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 1 : static_cast<int>(n);
}

}  // namespace

extern "C" {

// Bit-exact PIL LANCZOS resize. src: (in_h, in_w, ch) uint8 contiguous;
// dst: (out_h, out_w, ch). Returns 0 on success.
int md_resize_lanczos(const uint8_t* src, int in_h, int in_w, int ch,
                      uint8_t* dst, int out_h, int out_w, int n_threads) {
  if (!src || !dst || in_h <= 0 || in_w <= 0 || ch <= 0 || out_h <= 0 ||
      out_w <= 0)
    return 1;
  if (n_threads <= 0) n_threads = hw_threads();

  const AxisCoeffs ch_coef = precompute(in_w, out_w);
  const AxisCoeffs cv_coef = precompute(in_h, out_h);

  // PIL order: horizontal first into a temp, then vertical.
  std::vector<uint8_t> tmp(static_cast<size_t>(in_h) * out_w * ch);
  resample_horizontal(src, in_h, in_w, ch, tmp.data(), out_w, ch_coef,
                      n_threads);
  resample_vertical(tmp.data(), in_h, out_w, ch, dst, out_h, cv_coef,
                    n_threads);
  return 0;
}

// Full overlap-crop pipeline (reference image_crops.py:58-167 geometry,
// matching moondream_tpu/ops/image_crops.py:overlap_crop_image):
//   out[0]            = global resize of src to (base, base)
//   out[1 + r*cols+c] = tile (r, c) of src resized to
//                       (rows*window + 2*margin, cols*window + 2*margin),
//                       window = base - 2*margin_px
// src: (h, w, ch) uint8. out: (rows*cols + 1, base, base, ch), zero-filled
// by the caller. The two resizes and the tile extraction run here.
int md_overlap_crops(const uint8_t* src, int h, int w, int ch, uint8_t* out,
                     int base, int margin_px, int rows, int cols,
                     int n_threads) {
  if (!src || !out || h <= 0 || w <= 0 || rows <= 0 || cols <= 0) return 1;
  if (n_threads <= 0) n_threads = hw_threads();
  const int window = base - 2 * margin_px;
  const int target_h = rows * window + 2 * margin_px;
  const int target_w = cols * window + 2 * margin_px;
  const size_t crop_sz = static_cast<size_t>(base) * base * ch;

  // global crop
  if (md_resize_lanczos(src, h, w, ch, out, base, base, n_threads)) return 1;

  // grid resize
  std::vector<uint8_t> resized(static_cast<size_t>(target_h) * target_w * ch);
  if (md_resize_lanczos(src, h, w, ch, resized.data(), target_h, target_w,
                        n_threads))
    return 1;

  // tile extraction (row-parallel over tiles)
  std::atomic<int> next(0);
  auto worker = [&]() {
    int idx;
    while ((idx = next.fetch_add(1)) < rows * cols) {
      const int r = idx / cols, c = idx % cols;
      const int y0 = r * window, x0 = c * window;
      const int th = std::min(base, target_h - y0);
      const int tw = std::min(base, target_w - x0);
      uint8_t* dst = out + (1 + idx) * crop_sz;
      for (int y = 0; y < th; ++y)
        std::memcpy(dst + static_cast<size_t>(y) * base * ch,
                    resized.data() +
                        (static_cast<size_t>(y0 + y) * target_w + x0) * ch,
                    static_cast<size_t>(tw) * ch);
    }
  };
  std::vector<std::thread> ts;
  const int nt = std::min(n_threads, rows * cols);
  for (int t = 0; t < nt - 1; ++t) ts.emplace_back(worker);
  worker();
  for (auto& th : ts) th.join();
  return 0;
}

int md_version() { return 1; }

}  // extern "C"
