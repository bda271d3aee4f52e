// Native host-side radar batch assembly (the data pipeline's hot loop).
//
// Role in the framework: the reference's DataLoader workers spend their time
// slicing/copying THWC radar windows and normalizing them in Python/numpy
// (/root/reference/train/run.py:118-158).  This library does the gather,
// crop, normalization, and batch packing in one OpenMP-parallel pass so a
// single host thread can keep a TPU fed.  Bound via ctypes
// (skillful_nowcasting_tpu/data/native.py) with a numpy fallback.
//
// Layout contract: frames are float32 THWC; batches are NTHWC.

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Pack one batch of windows.
//
//   frames:      (n_frames, H, W, C) float32 — a contiguous frame pool
//   starts:      (batch,) int64 — window start index per sample
//   crop_y/x:    (batch,) int64 — top-left corner of the crop per sample
//   out_inputs:  (batch, n_in,  crop_h, crop_w, C)
//   out_targets: (batch, n_tgt, crop_h, crop_w, C)
//
// Each window spans n_in + n_tgt consecutive frames starting at starts[b];
// values are transformed as (v * scale + offset), NaNs replaced by nan_fill.
// Returns 0 on success, -1 on out-of-bounds arguments.
int pack_windows(const float* frames, int64_t n_frames, int64_t H, int64_t W,
                 int64_t C, const int64_t* starts, const int64_t* crop_y,
                 const int64_t* crop_x, int64_t batch, int64_t n_in,
                 int64_t n_tgt, int64_t crop_h, int64_t crop_w, float scale,
                 float offset, float nan_fill, float* out_inputs,
                 float* out_targets) {
  const int64_t total = n_in + n_tgt;
  for (int64_t b = 0; b < batch; ++b) {
    if (starts[b] < 0 || starts[b] + total > n_frames) return -1;
    if (crop_y[b] < 0 || crop_y[b] + crop_h > H) return -1;
    if (crop_x[b] < 0 || crop_x[b] + crop_w > W) return -1;
  }

  const int64_t frame_stride = H * W * C;
  const int64_t row_stride = W * C;
  const int64_t out_row = crop_w * C;
  const int64_t out_frame = crop_h * out_row;

#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t b = 0; b < batch; ++b) {
    for (int64_t t = 0; t < total; ++t) {
      const float* src_frame = frames + (starts[b] + t) * frame_stride;
      float* dst = (t < n_in)
                       ? out_inputs + b * n_in * out_frame + t * out_frame
                       : out_targets + b * n_tgt * out_frame +
                             (t - n_in) * out_frame;
      for (int64_t y = 0; y < crop_h; ++y) {
        const float* src =
            src_frame + (crop_y[b] + y) * row_stride + crop_x[b] * C;
        float* drow = dst + y * out_row;
        if (scale == 1.0f && offset == 0.0f) {
          std::memcpy(drow, src, sizeof(float) * out_row);
          for (int64_t i = 0; i < out_row; ++i) {
            if (drow[i] != drow[i]) drow[i] = nan_fill;  // NaN scrub
          }
        } else {
          for (int64_t i = 0; i < out_row; ++i) {
            float v = src[i];
            if (v != v) v = nan_fill;
            drow[i] = v * scale + offset;
          }
        }
      }
    }
  }
  return 0;
}

// Space-to-depth on the host (NTHWC, factor f) — staging layout prep so the
// first device op sees MXU-friendly channel counts when desired.
int space_to_depth(const float* in, int64_t N, int64_t T, int64_t H, int64_t W,
                   int64_t C, int64_t f, float* out) {
  if (H % f || W % f) return -1;
  const int64_t Ho = H / f, Wo = W / f, Co = C * f * f;
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t n = 0; n < N * T; ++n) {
    for (int64_t ho = 0; ho < Ho; ++ho) {
      const float* src_img = in + n * H * W * C;
      float* dst_row = out + n * Ho * Wo * Co + ho * Wo * Co;
      for (int64_t wo = 0; wo < Wo; ++wo) {
        float* dst = dst_row + wo * Co;
        // torch PixelUnshuffle channel order: (C, fy, fx)
        for (int64_t c = 0; c < C; ++c) {
          for (int64_t fy = 0; fy < f; ++fy) {
            const float* src =
                src_img + ((ho * f + fy) * W + wo * f) * C + c;
            for (int64_t fx = 0; fx < f; ++fx) {
              dst[c * f * f + fy * f + fx] = src[fx * C];
            }
          }
        }
      }
    }
  }
  return 0;
}

int omp_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
