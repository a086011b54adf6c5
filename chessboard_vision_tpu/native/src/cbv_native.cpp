// Native host runtime for chessboard_vision_tpu.
//
// Two components (the framework's C++ runtime layer — the counterpart of
// the reference's Cython-as-C++ modules, but doing real work):
//
// 1. cbv_resample_*: SIMD-friendly bilinear warp + square extraction on the
//    host. Same arithmetic as the device path (per-channel f32 lerp,
//    round-half-even, constant-0 border via per-tap oob masks), driven by
//    the same calibration-time static plan (anchor index + fractions).
//    Used by the CPU fallback backend and by capture-side pre-warping.
//
// 2. cbv_ring_*: a lock-free single-producer single-consumer frame ring
//    buffer for the camera-thread -> pipeline-thread handoff (replaces the
//    reference's implicit "latest frame wins" cv2 polling with bounded,
//    copy-in slots and drop-oldest semantics).
//
// Build: make -C chessboard_vision_tpu/native   (produces libcbv_native.so)
// Python binding: ctypes (chessboard_vision_tpu/native/__init__.py).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Bilinear resample: queries with static anchor indices and fractions.
// frame: HWC u8 BGR. For query j:
//   anchor = idx[j] (flat index y*W+x), taps anchor, +1, +W, +W+1
//   oob[j] bit t set -> tap t contributes 0
//   out_c[j] = round_half_even(lerp2d(taps_c))
// ---------------------------------------------------------------------------

static inline float lerp2(float p00, float p01, float p10, float p11,
                          float fx, float fy) {
  float top = p00 + fx * (p01 - p00);
  float bot = p10 + fx * (p11 - p10);
  return top + fy * (bot - top);
}

static inline uint8_t round_u8(float v) {
  // round-half-even, clamp to [0, 255] (matches jnp.round + clip)
  float r = nearbyintf(v);
  if (r < 0.f) r = 0.f;
  if (r > 255.f) r = 255.f;
  return (uint8_t)r;
}

void cbv_resample_bgr(const uint8_t* frame, int64_t src_w,
                      const int32_t* idx, const float* fx, const float* fy,
                      const uint8_t* oob, int64_t n_queries,
                      uint8_t* out_b, uint8_t* out_g, uint8_t* out_r) {
  const int64_t stride = src_w * 3;
  for (int64_t j = 0; j < n_queries; ++j) {
    const int64_t a = (int64_t)idx[j] * 3;
    const uint8_t m = oob[j];
    const float w_x = fx[j], w_y = fy[j];
    for (int c = 0; c < 3; ++c) {
      float p00 = (m & 1) ? 0.f : (float)frame[a + c];
      float p01 = (m & 2) ? 0.f : (float)frame[a + 3 + c];
      float p10 = (m & 4) ? 0.f : (float)frame[a + stride + c];
      float p11 = (m & 8) ? 0.f : (float)frame[a + stride + 3 + c];
      float v = lerp2(p00, p01, p10, p11, w_x, w_y);
      uint8_t r8 = round_u8(v);
      if (c == 0) out_b[j] = r8;
      else if (c == 1) out_g[j] = r8;
      else out_r[j] = r8;
    }
  }
}

// Resample + exact fixed-point grayscale in one pass
// (gray = (R*9798 + G*19235 + B*3735 + 2^14) >> 15, the cv2 u8 formula).
void cbv_resample_gray(const uint8_t* frame, int64_t src_w,
                       const int32_t* idx, const float* fx, const float* fy,
                       const uint8_t* oob, int64_t n_queries, uint8_t* out) {
  const int64_t stride = src_w * 3;
  for (int64_t j = 0; j < n_queries; ++j) {
    const int64_t a = (int64_t)idx[j] * 3;
    const uint8_t m = oob[j];
    const float w_x = fx[j], w_y = fy[j];
    int32_t ch[3];
    for (int c = 0; c < 3; ++c) {
      float p00 = (m & 1) ? 0.f : (float)frame[a + c];
      float p01 = (m & 2) ? 0.f : (float)frame[a + 3 + c];
      float p10 = (m & 4) ? 0.f : (float)frame[a + stride + c];
      float p11 = (m & 8) ? 0.f : (float)frame[a + stride + 3 + c];
      ch[c] = (int32_t)round_u8(lerp2(p00, p01, p10, p11, w_x, w_y));
    }
    out[j] = (uint8_t)((ch[2] * 9798 + ch[1] * 19235 + ch[0] * 3735 + (1 << 14)) >> 15);
  }
}

// HWC -> planar conversion (the TPU-native frame layout).
void cbv_to_planar(const uint8_t* hwc, int64_t h, int64_t w, uint8_t* planar) {
  const int64_t n = h * w;
  for (int64_t i = 0; i < n; ++i) {
    planar[i] = hwc[i * 3];
    planar[n + i] = hwc[i * 3 + 1];
    planar[2 * n + i] = hwc[i * 3 + 2];
  }
}

// ---------------------------------------------------------------------------
// SPSC frame ring buffer (drop-oldest when full).
// ---------------------------------------------------------------------------

struct CbvRing {
  std::vector<uint8_t> data;
  std::vector<int64_t> seq;  // sequence number per slot (0 = empty)
  int64_t slot_bytes;
  int64_t n_slots;
  std::atomic<int64_t> head;  // next write position (producer)
  std::atomic<int64_t> tail;  // next read position (consumer)
  std::atomic<int64_t> dropped;
  int64_t next_seq;
};

void* cbv_ring_create(int64_t slot_bytes, int64_t n_slots) {
  CbvRing* r = new CbvRing();
  r->data.resize(slot_bytes * n_slots);
  r->seq.assign(n_slots, 0);
  r->slot_bytes = slot_bytes;
  r->n_slots = n_slots;
  r->head.store(0);
  r->tail.store(0);
  r->dropped.store(0);
  r->next_seq = 1;
  return r;
}

void cbv_ring_destroy(void* ring) { delete (CbvRing*)ring; }

// Producer: copy a frame in. Returns its sequence number.
int64_t cbv_ring_push(void* ring, const uint8_t* frame) {
  CbvRing* r = (CbvRing*)ring;
  int64_t h = r->head.load(std::memory_order_relaxed);
  int64_t t = r->tail.load(std::memory_order_acquire);
  if (h - t >= r->n_slots) {  // full: drop oldest
    r->tail.store(t + 1, std::memory_order_release);
    r->dropped.fetch_add(1, std::memory_order_relaxed);
  }
  int64_t slot = h % r->n_slots;
  std::memcpy(&r->data[slot * r->slot_bytes], frame, r->slot_bytes);
  r->seq[slot] = r->next_seq++;
  r->head.store(h + 1, std::memory_order_release);
  return r->seq[slot];
}

// Consumer: copy the next frame out. Returns its sequence number, 0 if empty.
int64_t cbv_ring_pop(void* ring, uint8_t* out) {
  CbvRing* r = (CbvRing*)ring;
  int64_t t = r->tail.load(std::memory_order_relaxed);
  int64_t h = r->head.load(std::memory_order_acquire);
  if (t >= h) return 0;
  int64_t slot = t % r->n_slots;
  std::memcpy(out, &r->data[slot * r->slot_bytes], r->slot_bytes);
  int64_t s = r->seq[slot];
  r->tail.store(t + 1, std::memory_order_release);
  return s;
}

// Consumer: skip to the most recent frame (drop backlog), like the
// reference's SKIP_FRAMES polling. Returns frames skipped.
int64_t cbv_ring_skip_to_latest(void* ring) {
  CbvRing* r = (CbvRing*)ring;
  int64_t t = r->tail.load(std::memory_order_relaxed);
  int64_t h = r->head.load(std::memory_order_acquire);
  if (h - t <= 1) return 0;
  int64_t skipped = h - 1 - t;
  r->tail.store(h - 1, std::memory_order_release);
  return skipped;
}

int64_t cbv_ring_size(void* ring) {
  CbvRing* r = (CbvRing*)ring;
  return r->head.load() - r->tail.load();
}

int64_t cbv_ring_dropped(void* ring) {
  return ((CbvRing*)ring)->dropped.load();
}

}  // extern "C"
