// story_feeder: native host-side batch packing + prefetch for the story
// input pipeline.
//
// The reference's input pipeline is torch DataLoader workers doing python
// per-image transforms (mydatasets/flintstones.py:129-199). On TPU hosts the
// input pipeline must keep HBM fed without stealing cycles from the XLA
// runtime thread, so the hot per-pixel work (uint8 -> normalized float
// target/source/CLIP tensors + mask assembly for all 5 frames) runs here in
// C++ with a background prefetch thread pool, exposed to Python via ctypes
// (rcdms_tpu/data/native_feeder.py).
//
// Build: make -C native   (produces libstory_feeder.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Pillow-compatible bicubic resize (two-pass, 8-bit fixed point).
//
// Replicates PIL.Image.resize(..., BICUBIC) exactly — the same resampling
// data/protocol.py uses via PIL — including the adaptive (antialias) filter
// support on downscale, the INT32 coefficient quantization with
// PRECISION_BITS = 22, per-pass uint8 rounding, and the horizontal-then-
// vertical pass order. Keeping the native feeder bit-identical to the numpy
// protocol means enabling it cannot change training numerics.
// ---------------------------------------------------------------------------

}  // extern "C"

#include <cmath>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow PRECISION_BITS

inline double bicubic_filter(double x) {
  const double a = -0.5;  // Keys kernel, PIL BICUBIC
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

inline double bilinear_filter(double x) {  // PIL BILINEAR (triangle)
  if (x < 0.0) x = -x;
  if (x < 1.0) return 1.0 - x;
  return 0.0;
}

enum Filter { kBicubic, kBilinear };

inline uint8_t clip8(int32_t in) {
  if (in >= (1 << (kPrecisionBits + 8))) return 255;
  if (in <= 0) return 0;
  return static_cast<uint8_t>(in >> kPrecisionBits);
}

struct Coeffs {
  std::vector<int> xmin;
  std::vector<int> xcount;
  std::vector<int32_t> k;  // out_size x ksize
  int ksize = 0;
};

Coeffs build_coeffs(int in_size, int out_size, Filter filt = kBicubic) {
  const double support_base = filt == kBicubic ? 2.0 : 1.0;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = support_base * filterscale;
  Coeffs c;
  c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.xmin.resize(out_size);
  c.xcount.resize(out_size);
  c.k.assign(static_cast<size_t>(out_size) * c.ksize, 0);
  std::vector<double> w(c.ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    const double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      w[x] = filt == kBicubic ? bicubic_filter((x + xmin - center + 0.5) * ss)
                              : bilinear_filter((x + xmin - center + 0.5) * ss);
      ww += w[x];
    }
    for (int x = 0; x < xmax; ++x) {
      const double v = w[x] / ww * (1 << kPrecisionBits);
      c.k[static_cast<size_t>(xx) * c.ksize + x] =
          static_cast<int32_t>(v < 0 ? v - 0.5 : v + 0.5);
    }
    c.xmin[xx] = xmin;
    c.xcount[xx] = xmax;
  }
  return c;
}

// Horizontal pass: (h, w, 3) -> (h, out_count, 3) uint8, selecting output
// columns [out_off, out_off + out_count) of a virtual out_w-wide resize.
void horizontal_pass(const uint8_t* src, int h, int w, const Coeffs& c,
                     int out_off, int out_count, uint8_t* dst) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    uint8_t* orow = dst + static_cast<size_t>(y) * out_count * 3;
    for (int xx = 0; xx < out_count; ++xx) {
      const int gx = xx + out_off;
      const int32_t* k = &c.k[static_cast<size_t>(gx) * c.ksize];
      const uint8_t* p = row + c.xmin[gx] * 3;
      const int n = c.xcount[gx];
      int32_t s0 = 1 << (kPrecisionBits - 1);
      int32_t s1 = s0, s2 = s0;
      for (int x = 0; x < n; ++x) {
        s0 += p[x * 3 + 0] * k[x];
        s1 += p[x * 3 + 1] * k[x];
        s2 += p[x * 3 + 2] * k[x];
      }
      orow[xx * 3 + 0] = clip8(s0);
      orow[xx * 3 + 1] = clip8(s1);
      orow[xx * 3 + 2] = clip8(s2);
    }
  }
}

// Vertical pass over an interleaved (h, row_elems) uint8 buffer, output rows
// [out_off, out_off + out_count). Loop-swapped (taps outer, columns inner)
// so GCC vectorizes the u8->i32 multiply-accumulate. The optional affine
// epilogue (scale/bias per channel index % 3) fuses the float normalization
// into the pass — no extra image-sized round trip.
void vertical_pass_u8(const uint8_t* tmp, int row_elems, const Coeffs& c,
                      int out_off, int out_count, uint8_t* dst,
                      std::vector<int32_t>& acc) {
  acc.resize(row_elems);
  for (int yy = 0; yy < out_count; ++yy) {
    const int gy = yy + out_off;
    const int32_t* k = &c.k[static_cast<size_t>(gy) * c.ksize];
    const int ymin = c.xmin[gy], n = c.xcount[gy];
    int32_t* a = acc.data();
    for (int x = 0; x < row_elems; ++x) a[x] = 1 << (kPrecisionBits - 1);
    for (int y = 0; y < n; ++y) {
      const uint8_t* row = tmp + static_cast<size_t>(ymin + y) * row_elems;
      const int32_t kv = k[y];
      for (int x = 0; x < row_elems; ++x) a[x] += row[x] * kv;
    }
    uint8_t* orow = dst + static_cast<size_t>(yy) * row_elems;
    for (int x = 0; x < row_elems; ++x) orow[x] = clip8(a[x]);
  }
}

// Normalization epilogue via a per-channel 256-entry LUT whose entries are
// computed with numpy's exact fp32 op order ((x / d - m) / s), so outputs
// stay bit-identical to data/protocol.py at SIMD-friendly speed.
struct NormLut {
  float t[3][256];
  NormLut(const float d[3], const float m[3], const float s[3]) {
    for (int ch = 0; ch < 3; ++ch)
      for (int v = 0; v < 256; ++v)
        t[ch][v] = (static_cast<float>(v) / d[ch] - m[ch]) / s[ch];
  }
};

void vertical_pass_f32(const uint8_t* tmp, int row_elems, const Coeffs& c,
                       int out_off, int out_count, const NormLut& lut,
                       float* dst, std::vector<int32_t>& acc) {
  acc.resize(row_elems);
  for (int yy = 0; yy < out_count; ++yy) {
    const int gy = yy + out_off;
    const int32_t* k = &c.k[static_cast<size_t>(gy) * c.ksize];
    const int ymin = c.xmin[gy], n = c.xcount[gy];
    int32_t* a = acc.data();
    for (int x = 0; x < row_elems; ++x) a[x] = 1 << (kPrecisionBits - 1);
    for (int y = 0; y < n; ++y) {
      const uint8_t* row = tmp + static_cast<size_t>(ymin + y) * row_elems;
      const int32_t kv = k[y];
      for (int x = 0; x < row_elems; ++x) a[x] += row[x] * kv;
    }
    float* orow = dst + static_cast<size_t>(yy) * row_elems;
    for (int x = 0; x < row_elems; x += 3) {
      orow[x + 0] = lut.t[0][clip8(a[x + 0])];
      orow[x + 1] = lut.t[1][clip8(a[x + 1])];
      orow[x + 2] = lut.t[2][clip8(a[x + 2])];
    }
  }
}

// (h, w, 3) -> (out_h, out_w, 3), uint8, PIL-exact.
void resize_impl(const uint8_t* src, int h, int w, int out_h,
                 int out_w, uint8_t* dst, Filter filt) {
  if (h == out_h && w == out_w) {  // PIL returns a copy for identity resize
    std::memcpy(dst, src, static_cast<size_t>(h) * w * 3);
    return;
  }
  std::vector<uint8_t> tmp(static_cast<size_t>(h) * out_w * 3);
  const Coeffs ch_ = build_coeffs(w, out_w, filt);
  horizontal_pass(src, h, w, ch_, 0, out_w, tmp.data());
  const Coeffs cv = build_coeffs(h, out_h, filt);
  std::vector<int32_t> acc;
  vertical_pass_u8(tmp.data(), out_w * 3, cv, 0, out_h, dst, acc);
}

// resize + center-crop to (crop, crop) + per-channel affine, fusing the
// crop into the passes (only the needed columns/rows are computed) and the
// float normalization into the vertical epilogue.
void resize_crop_normalize(const uint8_t* src, int h, int w, int nh, int nw,
                           int crop, const float d[3], const float m[3],
                           const float s[3], float* dst,
                           Filter filt = kBicubic) {
  const int top = (nh - crop) / 2;
  const int left = (nw - crop) / 2;
  const NormLut lut(d, m, s);
  std::vector<uint8_t> tmp;
  std::vector<int32_t> acc;
  if (h == nh && w == nw) {  // identity resize: plain crop + normalize
    for (int y = 0; y < crop; ++y) {
      const uint8_t* row = src + (static_cast<size_t>(y + top) * w + left) * 3;
      float* orow = dst + static_cast<size_t>(y) * crop * 3;
      for (int x = 0; x < crop * 3; x += 3) {
        orow[x + 0] = lut.t[0][row[x + 0]];
        orow[x + 1] = lut.t[1][row[x + 1]];
        orow[x + 2] = lut.t[2][row[x + 2]];
      }
    }
    return;
  }
  const Coeffs chh = build_coeffs(w, nw, filt);
  tmp.resize(static_cast<size_t>(h) * crop * 3);
  horizontal_pass(src, h, w, chh, left, crop, tmp.data());
  const Coeffs cv = build_coeffs(h, nh, filt);
  vertical_pass_f32(tmp.data(), crop * 3, cv, top, crop, lut, dst, acc);
}

}  // namespace

extern "C" {

// exported for tests (parity vs PIL through data/protocol.py)
void resize_bicubic(const uint8_t* src, int h, int w, int out_h, int out_w,
                    uint8_t* dst) {
  resize_impl(src, h, w, out_h, out_w, dst, kBicubic);
}

void resize_bilinear(const uint8_t* src, int h, int w, int out_h, int out_w,
                     uint8_t* dst) {
  resize_impl(src, h, w, out_h, out_w, dst, kBilinear);
}

// ---------------------------------------------------------------------------
// Pixel kernels (bicubic resize + normalization, matching data/protocol.py)
// ---------------------------------------------------------------------------

// uint8 HWC -> float32 HWC in [-1, 1] with PIL-BILINEAR resize to
// (out, out) == protocol.pixel_preprocess (x / 127.5 - 1, numpy op order).
// Bilinear because the reference's transforms.Resize([s, s]) uses
// torchvision's default InterpolationMode.BILINEAR
// (mydatasets/flintstones.py:78); CLIP preprocessing below stays bicubic.
void normalize_pixels(const uint8_t* src, int h, int w, int out, float* dst) {
  static const float kD[3] = {127.5f, 127.5f, 127.5f};
  static const float kM[3] = {1.0f, 1.0f, 1.0f};
  static const float kS[3] = {1.0f, 1.0f, 1.0f};
  resize_crop_normalize(src, h, w, out, out, out, kD, kM, kS, dst,
                        kBilinear);
}

// uint8 HWC -> CLIP-normalized float32: PIL-bicubic resize shortest side to
// `out` (round-half-even sizes like python round()), center crop, CLIP
// mean/std == protocol.clip_preprocess ((x / 255 - mean) / std).
void clip_normalize_pixels(const uint8_t* src, int h, int w, int out,
                           float* dst) {
  static const float kD[3] = {255.0f, 255.0f, 255.0f};
  static const float kMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
  static const float kStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};
  const double scale = static_cast<double>(out) / (h < w ? h : w);
  const int nh = static_cast<int>(std::nearbyint(h * scale));
  const int nw = static_cast<int>(std::nearbyint(w * scale));
  resize_crop_normalize(src, h, w, nh, nw, out, kD, kMean, kStd, dst);
}

// Assemble one story's tensors from f decoded frames (all h x w x 3 uint8).
// Outputs (caller-allocated, contiguous):
//   target      (f, size, size, 3)  f32
//   source      (f, size, size, 3)  f32: frames < known_length, else -1.0
//   ref_clip    (f, csize, csize, 3) f32
//   source_clip (f, csize, csize, 3) f32: known frames, else CLIP(black)
//   mask_clip   (f, csize, csize, 3) f32: CLIP(white) if known else black
//   mask_label  (f, size/8, size/8, 1) f32 {0,1}
void pack_story(const uint8_t* frames, int f, int h, int w, int size,
                int csize, int known_length, float* target, float* source,
                float* ref_clip, float* source_clip, float* mask_clip,
                float* mask_label) {
  const int px = size * size * 3;
  const int cpx = csize * csize * 3;
  const int m = size / 8;

  std::vector<float> black_clip(cpx), white_clip(cpx);
  std::vector<uint8_t> black_img(static_cast<size_t>(size) * size * 3, 0);
  std::vector<uint8_t> white_img(static_cast<size_t>(size) * size * 3, 255);
  clip_normalize_pixels(black_img.data(), size, size, csize,
                        black_clip.data());
  clip_normalize_pixels(white_img.data(), size, size, csize,
                        white_clip.data());

  for (int i = 0; i < f; ++i) {
    const uint8_t* fr = frames + static_cast<size_t>(i) * h * w * 3;
    normalize_pixels(fr, h, w, size, target + static_cast<size_t>(i) * px);
    clip_normalize_pixels(fr, h, w, csize,
                          ref_clip + static_cast<size_t>(i) * cpx);
    const bool known = i < known_length;
    if (known) {
      std::memcpy(source + static_cast<size_t>(i) * px,
                  target + static_cast<size_t>(i) * px, px * sizeof(float));
      std::memcpy(source_clip + static_cast<size_t>(i) * cpx,
                  ref_clip + static_cast<size_t>(i) * cpx,
                  cpx * sizeof(float));
      std::memcpy(mask_clip + static_cast<size_t>(i) * cpx,
                  white_clip.data(), cpx * sizeof(float));
    } else {
      for (int j = 0; j < px; ++j)
        source[static_cast<size_t>(i) * px + j] = -1.0f;
      std::memcpy(source_clip + static_cast<size_t>(i) * cpx,
                  black_clip.data(), cpx * sizeof(float));
      std::memcpy(mask_clip + static_cast<size_t>(i) * cpx,
                  black_clip.data(), cpx * sizeof(float));
    }
    const float mv = known ? 1.0f : 0.0f;
    for (int j = 0; j < m * m; ++j)
      mask_label[static_cast<size_t>(i) * m * m + j] = mv;
  }
}

// ---------------------------------------------------------------------------
// Prefetch thread pool: run pack_story jobs in background threads so the
// Python thread (and the XLA dispatch thread) never blocks on pixel work.
// ---------------------------------------------------------------------------

struct Pool {
  std::vector<std::thread> workers;
  std::deque<std::function<void()>> jobs;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable done_cv;
  std::atomic<int> inflight{0};
  bool stop = false;
};

void* feeder_create(int num_threads) {
  auto* p = new Pool();
  if (num_threads < 1) num_threads = 1;
  for (int i = 0; i < num_threads; ++i) {
    p->workers.emplace_back([p] {
      for (;;) {
        std::function<void()> job;
        {
          std::unique_lock<std::mutex> lk(p->mu);
          p->cv.wait(lk, [p] { return p->stop || !p->jobs.empty(); });
          if (p->stop && p->jobs.empty()) return;
          job = std::move(p->jobs.front());
          p->jobs.pop_front();
        }
        job();
        // decrement + notify UNDER the pool mutex: an unlocked
        // fetch_sub/notify can fire between feeder_wait's predicate check
        // and its wait, the classic lost wakeup — feeder_wait would then
        // block forever on the last batch
        bool last;
        {
          std::lock_guard<std::mutex> lk(p->mu);
          last = p->inflight.fetch_sub(1) == 1;
        }
        if (last) p->done_cv.notify_all();
      }
    });
  }
  return p;
}

void feeder_submit_story(void* pool, const uint8_t* frames, int f, int h,
                         int w, int size, int csize, int known_length,
                         float* target, float* source, float* ref_clip,
                         float* source_clip, float* mask_clip,
                         float* mask_label) {
  auto* p = static_cast<Pool*>(pool);
  p->inflight.fetch_add(1);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->jobs.emplace_back([=] {
      pack_story(frames, f, h, w, size, csize, known_length, target, source,
                 ref_clip, source_clip, mask_clip, mask_label);
    });
  }
  p->cv.notify_one();
}

void feeder_wait(void* pool) {
  auto* p = static_cast<Pool*>(pool);
  std::unique_lock<std::mutex> lk(p->mu);
  p->done_cv.wait(lk, [p] { return p->inflight.load() == 0; });
}

void feeder_destroy(void* pool) {
  auto* p = static_cast<Pool*>(pool);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
