// Host-side image preprocessing for the TPU input pipeline.
//
// The device never waits on input when the host can convert+normalize a
// batch faster than the chip consumes it; numpy does uint8->f32, /255,
// (x-mean)/std and HWC->CHW as four passes with three temporaries, which
// is the host bottleneck at large batch. This single fused pass writes
// the final planar layout once. (The reference has no data loader —
// SURVEY.md §2.8 — so this is new TPU-serving infrastructure, not a port.)
//
// Built by uniception_tpu/native/__init__.py with g++ -O3; called through
// ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstddef>

extern "C" {

// src: (B, H, W, 3) uint8, contiguous. dst: (B, 3, H, W) float32.
// scale[c] / bias[c]: y = x * scale[c] + bias[c], with x the raw byte —
// callers fold the /255 and (x-mean)/std into these two constants.
void normalize_u8_hwc_to_f32_chw(const uint8_t* src, float* dst,
                                 int64_t b, int64_t h, int64_t w,
                                 const float* scale, const float* bias) {
  const int64_t hw = h * w;
  const float s0 = scale[0], s1 = scale[1], s2 = scale[2];
  const float b0 = bias[0], b1 = bias[1], b2 = bias[2];
  for (int64_t n = 0; n < b; ++n) {
    const uint8_t* sp = src + n * hw * 3;
    float* d0 = dst + n * 3 * hw;
    float* d1 = d0 + hw;
    float* d2 = d1 + hw;
    for (int64_t i = 0; i < hw; ++i) {
      const uint8_t* px = sp + i * 3;
      d0[i] = (float)px[0] * s0 + b0;
      d1[i] = (float)px[1] * s1 + b1;
      d2[i] = (float)px[2] * s2 + b2;
    }
  }
}

// f32 HWC -> normalized f32 CHW (for callers that already decoded to float).
void normalize_f32_hwc_to_f32_chw(const float* src, float* dst,
                                  int64_t b, int64_t h, int64_t w,
                                  const float* scale, const float* bias) {
  const int64_t hw = h * w;
  const float s0 = scale[0], s1 = scale[1], s2 = scale[2];
  const float b0 = bias[0], b1 = bias[1], b2 = bias[2];
  for (int64_t n = 0; n < b; ++n) {
    const float* sp = src + n * hw * 3;
    float* d0 = dst + n * 3 * hw;
    float* d1 = d0 + hw;
    float* d2 = d1 + hw;
    for (int64_t i = 0; i < hw; ++i) {
      const float* px = sp + i * 3;
      d0[i] = px[0] * s0 + b0;
      d1[i] = px[1] * s1 + b1;
      d2[i] = px[2] * s2 + b2;
    }
  }
}

}  // extern "C"
