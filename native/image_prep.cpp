// Host-side image preprocessing kernels for the data loader.
//
// The reference leans on external native code (PIL/cv2 inside 16 torch
// dataloader workers) for its image hot path (ref:train_denoiser.py:646-683).
// This library provides the same operations as a small multithreaded C++
// core with a C ABI for ctypes:
//   - PIL-compatible bicubic resize (Catmull-Rom a=-0.5, support widening on
//     downscale, per-axis separable passes — mirrors PIL Resample.c results)
//   - CLIP normalization
//   - Qwen-ViT patch flattening (merge-block order) in one fused pass
//   - VAE view ([-1, 1] scaling)
//
// Build: g++ -O3 -march=native -shared -fPIC -o libimage_prep.so image_prep.cpp -lpthread

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr double kA = -0.5;  // PIL bicubic coefficient

double bicubic_filter(double x) {
  x = std::abs(x);
  if (x < 1.0) return ((kA + 2.0) * x - (kA + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * kA;
  return 0.0;
}

struct AxisWeights {
  int ksize = 0;
  std::vector<int> bounds;      // (out, 2): xmin, xmax-xmin
  std::vector<double> weights;  // (out, ksize)
};

// Mirrors PIL's precompute_coeffs (ImagingResampleHorizontal prep).
AxisWeights precompute(int in_size, int out_size) {
  AxisWeights w;
  const double support_base = 2.0;  // bicubic support
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = support_base * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  w.ksize = ksize;
  w.bounds.resize(out_size * 2);
  w.weights.assign(static_cast<size_t>(out_size) * ksize, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &w.weights[static_cast<size_t>(xx) * ksize];
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double val = bicubic_filter((x + xmin - center + 0.5) / filterscale);
      k[x] = val;
      ww += val;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    w.bounds[xx * 2] = xmin;
    w.bounds[xx * 2 + 1] = xmax;
  }
  return w;
}

// Separable bicubic resize, float32 planar-agnostic (HWC, C channels).
void resize_bicubic_f32(const float* src, int sh, int sw, int channels,
                        float* dst, int dh, int dw) {
  AxisWeights wx = precompute(sw, dw);
  AxisWeights wy = precompute(sh, dh);

  // horizontal pass: (sh, sw, C) -> (sh, dw, C)
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * channels);
  for (int y = 0; y < sh; ++y) {
    const float* row = src + static_cast<size_t>(y) * sw * channels;
    float* out = tmp.data() + static_cast<size_t>(y) * dw * channels;
    for (int x = 0; x < dw; ++x) {
      int xmin = wx.bounds[x * 2], xmax = wx.bounds[x * 2 + 1];
      const double* k = &wx.weights[static_cast<size_t>(x) * wx.ksize];
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        for (int i = 0; i < xmax; ++i)
          acc += row[(xmin + i) * channels + c] * k[i];
        out[x * channels + c] = static_cast<float>(acc);
      }
    }
  }
  // vertical pass: (sh, dw, C) -> (dh, dw, C)
  for (int y = 0; y < dh; ++y) {
    int ymin = wy.bounds[y * 2], ymax = wy.bounds[y * 2 + 1];
    const double* k = &wy.weights[static_cast<size_t>(y) * wy.ksize];
    float* out = dst + static_cast<size_t>(y) * dw * channels;
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        for (int i = 0; i < ymax; ++i)
          acc += tmp[(static_cast<size_t>(ymin + i) * dw + x) * channels + c] * k[i];
        out[x * channels + c] = static_cast<float>(acc);
      }
    }
  }
}

void parallel_rows(int total, const std::function<void(int, int)>& fn) {
  int n = static_cast<int>(std::thread::hardware_concurrency());
  n = std::max(1, std::min(n, 16));
  if (total < 2 * n) {
    fn(0, total);
    return;
  }
  std::vector<std::thread> threads;
  int chunk = (total + n - 1) / n;
  for (int t = 0; t < n; ++t) {
    int lo = t * chunk, hi = std::min(total, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// uint8 HWC -> float32 HWC resize matching PIL semantics: the horizontal
// pass result is clipped+rounded back to uint8 before the vertical pass
// (PIL stores the intermediate image as uint8), and the final output is
// clipped+rounded too. Values stay on the 0..255 scale pre-normalize.
void resize_bicubic_u8(const uint8_t* src, int sh, int sw, int channels,
                       float* dst, int dh, int dw) {
  AxisWeights wx = precompute(sw, dw);
  AxisWeights wy = precompute(sh, dh);

  std::vector<uint8_t> tmp(static_cast<size_t>(sh) * dw * channels);
  parallel_rows(sh, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      const uint8_t* row = src + static_cast<size_t>(y) * sw * channels;
      uint8_t* out = tmp.data() + static_cast<size_t>(y) * dw * channels;
      for (int x = 0; x < dw; ++x) {
        int xmin = wx.bounds[x * 2], xmax = wx.bounds[x * 2 + 1];
        const double* k = &wx.weights[static_cast<size_t>(x) * wx.ksize];
        for (int c = 0; c < channels; ++c) {
          double acc = 0.0;
          for (int i = 0; i < xmax; ++i)
            acc += row[(xmin + i) * channels + c] * k[i];
          acc = std::min(255.0, std::max(0.0, acc + 0.5));
          out[x * channels + c] = static_cast<uint8_t>(acc);
        }
      }
    }
  });
  parallel_rows(dh, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      int ymin = wy.bounds[y * 2], ymax = wy.bounds[y * 2 + 1];
      const double* k = &wy.weights[static_cast<size_t>(y) * wy.ksize];
      float* out = dst + static_cast<size_t>(y) * dw * channels;
      for (int x = 0; x < dw; ++x) {
        for (int c = 0; c < channels; ++c) {
          double acc = 0.0;
          for (int i = 0; i < ymax; ++i)
            acc += tmp[(static_cast<size_t>(ymin + i) * dw + x) * channels + c] * k[i];
          acc = std::min(255.0, std::max(0.0, acc + 0.5));
          out[x * channels + c] = static_cast<float>(static_cast<uint8_t>(acc));
        }
      }
    }
  });
}

// Full ViT view: u8 HWC -> resize (rh, rw) -> /255 -> CLIP norm -> temporal
// tile x tp -> merge-block-ordered patch flatten.
// out: (grid_h*grid_w, C*tp*p*p) float32, with grid_h=rh/p, grid_w=rw/p.
void vit_preprocess(const uint8_t* src, int sh, int sw,
                    int rh, int rw, int patch, int merge, int tp,
                    const float* mean, const float* stdv,
                    float* out) {
  const int C = 3;
  std::vector<float> resized(static_cast<size_t>(rh) * rw * C);
  resize_bicubic_u8(src, sh, sw, C, resized.data(), rh, rw);

  const int gh = rh / patch, gw = rw / patch;
  const int ghm = gh / merge, gwm = gw / merge;
  const int feat = C * tp * patch * patch;

  // normalized CHW view
  std::vector<float> chw(static_cast<size_t>(C) * rh * rw);
  parallel_rows(rh, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y)
      for (int x = 0; x < rw; ++x)
        for (int c = 0; c < C; ++c)
          chw[(static_cast<size_t>(c) * rh + y) * rw + x] =
              (resized[(static_cast<size_t>(y) * rw + x) * C + c] / 255.0f -
               mean[c]) / stdv[c];
  });

  // patch order: (gh/m, gw/m, m, m) blocks; feature order: (c, t, py, px)
  parallel_rows(ghm, [&](int lo, int hi) {
    for (int by = lo; by < hi; ++by)
      for (int bx = 0; bx < gwm; ++bx)
        for (int my = 0; my < merge; ++my)
          for (int mx = 0; mx < merge; ++mx) {
            int gy = by * merge + my, gx = bx * merge + mx;
            size_t row = ((static_cast<size_t>(by) * gwm + bx) * merge + my) *
                             merge + mx;
            float* dst = out + row * feat;
            for (int c = 0; c < C; ++c)
              for (int t = 0; t < tp; ++t)
                for (int py = 0; py < patch; ++py)
                  for (int px = 0; px < patch; ++px) {
                    int y = gy * patch + py, x = gx * patch + px;
                    *dst++ = chw[(static_cast<size_t>(c) * rh + y) * rw + x];
                  }
          }
  });
}

// VAE view: u8 HWC -> resize -> [-1, 1] float32 HWC.
void vae_preprocess(const uint8_t* src, int sh, int sw,
                    int rh, int rw, float* out) {
  resize_bicubic_u8(src, sh, sw, 3, out, rh, rw);
  size_t n = static_cast<size_t>(rh) * rw * 3;
  for (size_t i = 0; i < n; ++i) out[i] = out[i] / 127.5f - 1.0f;
}

}  // extern "C"
