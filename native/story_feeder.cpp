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
// Pixel kernels
// ---------------------------------------------------------------------------

// uint8 HWC -> float32 HWC in [-1, 1] with bilinear resize to (out, out).
void normalize_pixels(const uint8_t* src, int h, int w, int out,
                      float* dst) {
  const float sy = static_cast<float>(h) / out;
  const float sx = static_cast<float>(w) / out;
  for (int y = 0; y < out; ++y) {
    // pixel-area-aligned bilinear (matches PIL/cv2 half-pixel centers)
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < out; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * w + x0) * 3 + c];
        float v01 = src[(y0 * w + x1) * 3 + c];
        float v10 = src[(y1 * w + x0) * 3 + c];
        float v11 = src[(y1 * w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(y * out + x) * 3 + c] = v / 127.5f - 1.0f;
      }
    }
  }
}

// uint8 HWC -> CLIP-normalized float32 (resize shortest side to `out`,
// center crop out x out, (x/255 - mean)/std).
void clip_normalize_pixels(const uint8_t* src, int h, int w, int out,
                           float* dst) {
  static const float kMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
  static const float kStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};
  const float scale = static_cast<float>(out) / (h < w ? h : w);
  const int nh = static_cast<int>(h * scale + 0.5f);
  const int nw = static_cast<int>(w * scale + 0.5f);
  const int top = (nh - out) / 2;
  const int left = (nw - out) / 2;
  const float sy = static_cast<float>(h) / nh;
  const float sx = static_cast<float>(w) / nw;
  for (int y = 0; y < out; ++y) {
    float fy = (y + top + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < out; ++x) {
      float fx = (x + left + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * w + x0) * 3 + c];
        float v01 = src[(y0 * w + x1) * 3 + c];
        float v10 = src[(y1 * w + x0) * 3 + c];
        float v11 = src[(y1 * w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(y * out + x) * 3 + c] = (v / 255.0f - kMean[c]) / kStd[c];
      }
    }
  }
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
        if (p->inflight.fetch_sub(1) == 1) p->done_cv.notify_all();
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
