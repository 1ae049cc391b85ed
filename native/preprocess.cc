// cosnet-tpu native data-path kernels.
//
// The reference's host data pipeline (dataloaders/sbm_rgbd_loader.py:590-697)
// chains cv2/numpy ops with a full-image intermediate after every step:
// u8 decode -> f32 subtract-mean -> per-channel ROI crop -> resize -> layout
// transpose. Here the whole post-decode pipeline is ONE fused pass per output
// pixel (gather-from-source with bilinear weights, mean subtraction folded
// in), multithreaded with OpenMP. Mean subtraction commutes with bilinear
// resampling (weights sum to 1), so the fused result equals the reference's
// op order to float precision.
//
// Semantics match cv2 exactly:
//  * INTER_LINEAR: src = (dst + 0.5) * scale - 0.5, edge-clamped;
//  * INTER_NEAREST: sx = floor(dx * scale) (cv2's resize nearest rule).
//
// Built as a plain shared library; Python binds via ctypes
// (cosnet_tpu/data/native.py). No external dependencies.

#include <cstdint>
#include <cmath>
#include <algorithm>

namespace {

struct AxisMap {
  int lo, hi;
  float w;  // value = (1-w)*src[lo] + w*src[hi]
};

inline void linear_axis(int src_size, int dst_size, AxisMap* map) {
  const double scale = static_cast<double>(src_size) / dst_size;
  for (int i = 0; i < dst_size; ++i) {
    double s = (i + 0.5) * scale - 0.5;
    if (s < 0) s = 0;
    if (s > src_size - 1) s = src_size - 1;
    int lo = static_cast<int>(s);
    if (lo > src_size - 1) lo = src_size - 1;
    int hi = std::min(lo + 1, src_size - 1);
    map[i] = {lo, hi, static_cast<float>(s - lo)};
  }
}

inline void nearest_axis(int src_size, int dst_size, int* map) {
  const double scale = static_cast<double>(src_size) / dst_size;
  for (int i = 0; i < dst_size; ++i) {
    int s = static_cast<int>(std::floor(i * scale));
    map[i] = std::min(s, src_size - 1);
  }
}

}  // namespace

extern "C" {

// Fused: crop [y0..y1]x[x0..x1] (inclusive, reference ROI semantics) of a
// u8 HWC image, bilinear-resize the crop to (dh, dw), subtract per-channel
// mean, emit f32 HWC. `channels` is 1 or 3.
void fused_crop_resize_meansub_u8(
    const uint8_t* src, int sh, int sw, int channels,
    int y0, int y1, int x0, int x1,
    const float* mean,
    float* dst, int dh, int dw) {
  const int ch = y1 - y0 + 1;
  const int cw = x1 - x0 + 1;
  AxisMap* ymap = new AxisMap[dh];
  AxisMap* xmap = new AxisMap[dw];
  linear_axis(ch, dh, ymap);
  linear_axis(cw, dw, xmap);

#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < dh; ++oy) {
    const AxisMap ym = ymap[oy];
    const uint8_t* row_lo = src + (static_cast<long>(y0 + ym.lo) * sw + x0) * channels;
    const uint8_t* row_hi = src + (static_cast<long>(y0 + ym.hi) * sw + x0) * channels;
    float* out_row = dst + static_cast<long>(oy) * dw * channels;
    for (int ox = 0; ox < dw; ++ox) {
      const AxisMap xm = xmap[ox];
      const float w00 = (1.f - ym.w) * (1.f - xm.w);
      const float w01 = (1.f - ym.w) * xm.w;
      const float w10 = ym.w * (1.f - xm.w);
      const float w11 = ym.w * xm.w;
      const uint8_t* p00 = row_lo + xm.lo * channels;
      const uint8_t* p01 = row_lo + xm.hi * channels;
      const uint8_t* p10 = row_hi + xm.lo * channels;
      const uint8_t* p11 = row_hi + xm.hi * channels;
      for (int c = 0; c < channels; ++c) {
        out_row[ox * channels + c] =
            w00 * p00[c] + w01 * p01[c] + w10 * p10[c] + w11 * p11[c] -
            (mean ? mean[c] : 0.f);
      }
    }
  }
  delete[] ymap;
  delete[] xmap;
}

// Nearest-neighbor crop+resize of a u8 single-channel image (gt masks),
// cv2 INTER_NEAREST rule; binarization (!=0 -> 1) folded in when binarize=1.
void fused_crop_resize_nearest_u8(
    const uint8_t* src, int sh, int sw,
    int y0, int y1, int x0, int x1,
    uint8_t* dst, int dh, int dw, int binarize) {
  const int ch = y1 - y0 + 1;
  const int cw = x1 - x0 + 1;
  int* ymap = new int[dh];
  int* xmap = new int[dw];
  nearest_axis(ch, dh, ymap);
  nearest_axis(cw, dw, xmap);

#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < dh; ++oy) {
    const uint8_t* row = src + static_cast<long>(y0 + ymap[oy]) * sw + x0;
    uint8_t* out_row = dst + static_cast<long>(oy) * dw;
    for (int ox = 0; ox < dw; ++ox) {
      uint8_t v = row[xmap[ox]];
      out_row[ox] = binarize ? (v != 0 ? 1 : 0) : v;
    }
  }
  delete[] ymap;
  delete[] xmap;
}

// f32 HWC bilinear resize (cv2 INTER_LINEAR float path) — used by the
// augmentation scale step.
void resize_bilinear_f32(
    const float* src, int sh, int sw, int channels,
    float* dst, int dh, int dw) {
  AxisMap* ymap = new AxisMap[dh];
  AxisMap* xmap = new AxisMap[dw];
  linear_axis(sh, dh, ymap);
  linear_axis(sw, dw, xmap);
#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < dh; ++oy) {
    const AxisMap ym = ymap[oy];
    const float* row_lo = src + static_cast<long>(ym.lo) * sw * channels;
    const float* row_hi = src + static_cast<long>(ym.hi) * sw * channels;
    float* out_row = dst + static_cast<long>(oy) * dw * channels;
    for (int ox = 0; ox < dw; ++ox) {
      const AxisMap xm = xmap[ox];
      const float w00 = (1.f - ym.w) * (1.f - xm.w);
      const float w01 = (1.f - ym.w) * xm.w;
      const float w10 = ym.w * (1.f - xm.w);
      const float w11 = ym.w * xm.w;
      for (int c = 0; c < channels; ++c) {
        out_row[ox * channels + c] =
            w00 * row_lo[xm.lo * channels + c] + w01 * row_lo[xm.hi * channels + c] +
            w10 * row_hi[xm.lo * channels + c] + w11 * row_hi[xm.hi * channels + c];
      }
    }
  }
  delete[] ymap;
  delete[] xmap;
}

// In-place horizontal flip, f32 HWC.
void flip_horizontal_f32(float* img, int h, int w, int channels) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    float* row = img + static_cast<long>(y) * w * channels;
    for (int x = 0; x < w / 2; ++x) {
      for (int c = 0; c < channels; ++c) {
        std::swap(row[x * channels + c], row[(w - 1 - x) * channels + c]);
      }
    }
  }
}

}  // extern "C"
