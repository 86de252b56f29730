// Native host-side frame preprocessing.
//
// The reference leans on third-party native code for its host pipeline
// (decord/ffmpeg for decode, OpenCV for resize — SURVEY.md §2.6).  This
// library is the framework's own native stage: fused
// uint8 -> [0,1] -> bicubic resize -> ImageNet-normalize, separable with
// precomputed tap tables, OpenMP-parallel over frames, writing directly
// into the NHWC float32 buffer the TPU H2D transfer consumes.
//
// Coordinate semantics match cv2.resize INTER_CUBIC on float input:
// src = (dst + 0.5) * (in/out) - 0.5, Keys cubic kernel A = -0.75,
// replicate borders (clamped taps).
//
// Build: make -C native   (produces libvda_preproc.so; ctypes binding in
// video_depth_anything_tpu/io/native_preproc.py)

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct TapTable {
  // per output coordinate: 4 clamped source indices and 4 weights
  std::vector<int> idx;     // size out*4
  std::vector<float> wgt;   // size out*4
};

inline float cubic(float x) {
  const float A = -0.75f;
  x = std::fabs(x);
  if (x <= 1.0f) return ((A + 2.0f) * x - (A + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * A;
  return 0.0f;
}

TapTable build_taps(int in_size, int out_size) {
  TapTable t;
  t.idx.resize(out_size * 4);
  t.wgt.resize(out_size * 4);
  const float scale = static_cast<float>(in_size) / out_size;
  for (int o = 0; o < out_size; ++o) {
    float src = (o + 0.5f) * scale - 0.5f;
    int base = static_cast<int>(std::floor(src));
    float frac = src - base;
    float w[4] = {cubic(frac + 1.0f), cubic(frac), cubic(1.0f - frac),
                  cubic(2.0f - frac)};
    // cv2 normalizes the 4 taps to sum to 1 in its table builder
    float sum = w[0] + w[1] + w[2] + w[3];
    for (int k = 0; k < 4; ++k) {
      int i = base - 1 + k;
      if (i < 0) i = 0;
      if (i >= in_size) i = in_size - 1;
      t.idx[o * 4 + k] = i;
      t.wgt[o * 4 + k] = w[k] / sum;
    }
  }
  return t;
}

}  // namespace

extern "C" {

// frames: (n, sh, sw, 3) uint8 RGB; out: (n, dh, dw, 3) float32 normalized.
// mean/std: 3 floats each (applied after /255 and resize).
void vda_preprocess_frames(const uint8_t* frames, int n, int sh, int sw,
                           float* out, int dh, int dw, const float* mean,
                           const float* stdev) {
  const TapTable tv = build_taps(sh, dh);
  const TapTable th = build_taps(sw, dw);
  const float inv255 = 1.0f / 255.0f;
  const float inv_std[3] = {1.0f / stdev[0], 1.0f / stdev[1], 1.0f / stdev[2]};

#pragma omp parallel
  {
    std::vector<float> hbuf(static_cast<size_t>(sh) * dw * 3);
#pragma omp for schedule(dynamic)
    for (int f = 0; f < n; ++f) {
      const uint8_t* src = frames + static_cast<size_t>(f) * sh * sw * 3;
      float* dst = out + static_cast<size_t>(f) * dh * dw * 3;
      // horizontal pass: (sh, sw, 3) u8 -> (sh, dw, 3) f32 in [0,1]
      for (int y = 0; y < sh; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
        float* hrow = hbuf.data() + static_cast<size_t>(y) * dw * 3;
        for (int x = 0; x < dw; ++x) {
          const int* ix = th.idx.data() + x * 4;
          const float* wx = th.wgt.data() + x * 4;
          for (int c = 0; c < 3; ++c) {
            float acc = wx[0] * row[ix[0] * 3 + c] + wx[1] * row[ix[1] * 3 + c] +
                        wx[2] * row[ix[2] * 3 + c] + wx[3] * row[ix[3] * 3 + c];
            hrow[x * 3 + c] = acc * inv255;
          }
        }
      }
      // vertical pass + normalize: (sh, dw, 3) -> (dh, dw, 3)
      for (int y = 0; y < dh; ++y) {
        const int* iy = tv.idx.data() + y * 4;
        const float* wy = tv.wgt.data() + y * 4;
        const float* r0 = hbuf.data() + static_cast<size_t>(iy[0]) * dw * 3;
        const float* r1 = hbuf.data() + static_cast<size_t>(iy[1]) * dw * 3;
        const float* r2 = hbuf.data() + static_cast<size_t>(iy[2]) * dw * 3;
        const float* r3 = hbuf.data() + static_cast<size_t>(iy[3]) * dw * 3;
        float* drow = dst + static_cast<size_t>(y) * dw * 3;
        for (int x = 0; x < dw * 3; x += 3) {
          for (int c = 0; c < 3; ++c) {
            float v = wy[0] * r0[x + c] + wy[1] * r1[x + c] +
                      wy[2] * r2[x + c] + wy[3] * r3[x + c];
            drow[x + c] = (v - mean[c]) * inv_std[c];
          }
        }
      }
    }
  }
}

// Gather preprocessed frames into spliced window tensors:
// pre: (n_frames, h, w, 3) f32; indices: (n_windows, win_len) int64;
// out: (n_windows, win_len, h, w, 3) f32.  Threaded memcpy — feeds the
// data-parallel window batch without numpy fancy-indexing copies.
void vda_gather_windows(const float* pre, const int64_t* indices,
                        int n_windows, int win_len, int64_t frame_elems,
                        float* out) {
#pragma omp parallel for collapse(2) schedule(static)
  for (int w = 0; w < n_windows; ++w) {
    for (int t = 0; t < win_len; ++t) {
      const float* src = pre + indices[w * win_len + t] * frame_elems;
      float* dst = out + (static_cast<int64_t>(w) * win_len + t) * frame_elems;
      std::memcpy(dst, src, sizeof(float) * frame_elems);
    }
  }
}

}  // extern "C"
