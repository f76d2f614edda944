// mquant_native — host-side native kernels for the data path.
//
// TPU-native equivalent of the reference's host-side data machinery (the
// reference's only native code is an external CUDA FWHT; its image pipeline is
// PIL/torchvision inside VLMEvalKit). Here the calibration/eval data loader's
// hot loops run in C++ (bilinear resize + normalize, patch extraction in the
// model's patchify order, int8 quantize, int4 split-half packing), exposed via
// a C ABI for ctypes. Threaded over rows with std::thread when the host has
// cores to spare.
//
// Build: make -C native   → libmquant_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

void parallel_rows(int n_rows, const std::function<void(int, int)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = std::max(1u, std::min(hw, 8u));
  if (n_threads <= 1 || n_rows < 64) {
    fn(0, n_rows);
    return;
  }
  std::vector<std::thread> ts;
  int chunk = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int lo = t * chunk, hi = std::min(n_rows, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// uint8 HWC image -> float CHW-agnostic HWC resize (bilinear) + per-channel
// normalize: dst = (src/255 - mean[c]) / std[c]
void mq_resize_normalize(const uint8_t* src, int sh, int sw, int c,
                         float* dst, int dh, int dw,
                         const float* mean, const float* stdev) {
  const float ry = dh > 1 ? (float)(sh - 1) / (dh - 1) : 0.f;
  const float rx = dw > 1 ? (float)(sw - 1) / (dw - 1) : 0.f;
  parallel_rows(dh, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      float fy = y * ry;
      int y_lo = (int)fy;
      int y_hi = std::min(y_lo + 1, sh - 1);
      float wy = fy - y_lo;
      for (int x = 0; x < dw; ++x) {
        float fx = x * rx;
        int x_lo = (int)fx;
        int x_hi = std::min(x_lo + 1, sw - 1);
        float wx = fx - x_lo;
        for (int k = 0; k < c; ++k) {
          float v00 = src[(y_lo * sw + x_lo) * c + k];
          float v01 = src[(y_lo * sw + x_hi) * c + k];
          float v10 = src[(y_hi * sw + x_lo) * c + k];
          float v11 = src[(y_hi * sw + x_hi) * c + k];
          float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                    wy * ((1 - wx) * v10 + wx * v11);
          dst[(y * dw + x) * c + k] = (v / 255.f - mean[k]) / stdev[k];
        }
      }
    }
  });
}

// (H, W, C) float image -> (gh*gw, p*p*C) patches, row-major patch order —
// exactly models/vision.py patchify_2d.
void mq_patchify_2d(const float* img, int h, int w, int c, int p, float* out) {
  int gh = h / p, gw = w / p;
  parallel_rows(gh, [&](int g0, int g1) {
    for (int gy = g0; gy < g1; ++gy) {
      for (int gx = 0; gx < gw; ++gx) {
        float* dst = out + ((size_t)(gy * gw + gx)) * p * p * c;
        for (int py = 0; py < p; ++py) {
          const float* srow = img + ((size_t)(gy * p + py) * w + gx * p) * c;
          std::memcpy(dst + (size_t)py * p * c, srow, sizeof(float) * p * c);
        }
      }
    }
  });
}

// Qwen2-VL patchify: (H, W, C) -> (gh*gw, p*p*T*C) with temporal dup T=2 and
// 2x2 merge-group-contiguous patch ordering — models/vision.py patchify_qwen2vl.
void mq_patchify_qwen2vl(const float* img, int h, int w, int c, int p,
                         float* out) {
  int gh = h / p, gw = w / p;
  int pd = p * p * 2 * c;  // per-patch feature dim
  parallel_rows(gh / 2, [&](int g0, int g1) {
    for (int by = g0; by < g1; ++by) {
      for (int bx = 0; bx < gw / 2; ++bx) {
        for (int iy = 0; iy < 2; ++iy) {
          for (int ix = 0; ix < 2; ++ix) {
            int gy = by * 2 + iy, gx = bx * 2 + ix;
            size_t out_idx = ((size_t)(by * (gw / 2) + bx) * 4 + iy * 2 + ix);
            float* dst = out + out_idx * pd;
            for (int py = 0; py < p; ++py) {
              for (int px = 0; px < p; ++px) {
                const float* s = img + ((size_t)(gy * p + py) * w + gx * p + px) * c;
                float* d = dst + ((size_t)(py * p + px) * 2) * c;
                std::memcpy(d, s, sizeof(float) * c);       // t = 0
                std::memcpy(d + c, s, sizeof(float) * c);   // t = 1 (dup)
              }
            }
          }
        }
      }
    }
  });
}

// symmetric int8 quantize: out = clip(round(x / scale), -127, 127)
void mq_quantize_int8(const float* x, float scale, int8_t* out, int64_t n) {
  float inv = 1.f / scale;
  parallel_rows((int)std::min<int64_t>(n / 4096 + 1, 1 << 20), [&](int b0, int b1) {
    int64_t lo = (int64_t)b0 * 4096, hi = std::min(n, (int64_t)b1 * 4096);
    for (int64_t i = lo; i < hi; ++i) {
      float v = std::nearbyint(x[i] * inv);
      out[i] = (int8_t)clampf(v, -127.f, 127.f);
    }
  });
}

// split-half int4 pack: q (in, out) int8 in [-8,7] -> packed (in/2, out):
// packed[r, c] = (q[r, c] & 0xF) | (q[r + in/2, c] << 4) — matches
// kernels/qmm.py quantize_weights_real.
void mq_pack_int4(const int8_t* q, int in_dim, int out_dim, int8_t* packed) {
  int half = in_dim / 2;
  parallel_rows(half, [&](int r0, int r1) {
    for (int r = r0; r < r1; ++r) {
      const int8_t* lo = q + (size_t)r * out_dim;
      const int8_t* hi = q + (size_t)(r + half) * out_dim;
      int8_t* dst = packed + (size_t)r * out_dim;
      for (int c = 0; c < out_dim; ++c) {
        dst[c] = (int8_t)((lo[c] & 0x0F) | ((hi[c] & 0x0F) << 4));
      }
    }
  });
}

// inverse: packed (in/2, out) -> q (in, out) sign-extended
void mq_unpack_int4(const int8_t* packed, int in_dim, int out_dim, int8_t* q) {
  int half = in_dim / 2;
  parallel_rows(half, [&](int r0, int r1) {
    for (int r = r0; r < r1; ++r) {
      const int8_t* src = packed + (size_t)r * out_dim;
      int8_t* lo = q + (size_t)r * out_dim;
      int8_t* hi = q + (size_t)(r + half) * out_dim;
      for (int c = 0; c < out_dim; ++c) {
        int v = (uint8_t)src[c];
        int l = v & 0x0F, h = (v >> 4) & 0x0F;
        lo[c] = (int8_t)(l >= 8 ? l - 16 : l);
        hi[c] = (int8_t)(h >= 8 ? h - 16 : h);
      }
    }
  });
}

int mq_version() { return 1; }

}  // extern "C"
