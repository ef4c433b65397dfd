// Native host-side runtime for feature_tracker_tpu.
//
// TPU-native counterpart of the reference's compiled runtime pieces
// (Slam_Utility's GrayImage/ImagePyramid buffers, SlamMemory allocator and
// TickTock timer; see SURVEY.md L1): the TPU owns the compute path, this
// library owns the host side of the pipeline —
//
//  - a lock-free single-producer/single-consumer frame ring buffer that
//    decouples camera/decoder threads from the device feed (the
//    data-loader role),
//  - cache-friendly uint8 -> float32 conversion and the half-resolution
//    2x2-average pyramid step with the reference's integer truncation
//    (ImagePyramid semantics: uint8 buffers, so each level floors), used
//    to prepare frames while the TPU tracks the previous pair,
//  - a monotonic nanosecond timer (TickTock equivalent).
//
// Exposed as a plain C ABI consumed via ctypes
// (feature_tracker_tpu/runtime/native.py); no Python headers required.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <new>
#include <vector>

namespace {

struct RingBuffer {
    std::vector<uint8_t> storage;
    size_t frame_bytes = 0;
    size_t capacity = 0;                  // number of frame slots
    std::atomic<uint64_t> head{0};        // next slot to write (producer)
    std::atomic<uint64_t> tail{0};        // next slot to read (consumer)
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- timing
uint64_t ftk_now_ns() {
    return static_cast<uint64_t>(
        std::chrono::duration_cast<std::chrono::nanoseconds>(
            std::chrono::steady_clock::now().time_since_epoch())
            .count());
}

// ------------------------------------------------------------ ring buffer
void* ftk_ring_create(size_t capacity, size_t frame_bytes) {
    if (capacity == 0 || frame_bytes == 0) return nullptr;
    auto* rb = new (std::nothrow) RingBuffer();
    if (!rb) return nullptr;
    rb->frame_bytes = frame_bytes;
    rb->capacity = capacity;
    rb->storage.resize(capacity * frame_bytes);
    return rb;
}

void ftk_ring_destroy(void* handle) {
    delete static_cast<RingBuffer*>(handle);
}

size_t ftk_ring_size(void* handle) {
    auto* rb = static_cast<RingBuffer*>(handle);
    return static_cast<size_t>(rb->head.load(std::memory_order_acquire) -
                               rb->tail.load(std::memory_order_acquire));
}

// Returns 1 on success, 0 when the ring is full (frame dropped — callers
// decide whether to retry or skip, matching a real camera pipeline).
int ftk_ring_push(void* handle, const uint8_t* frame, size_t bytes) {
    auto* rb = static_cast<RingBuffer*>(handle);
    if (bytes != rb->frame_bytes) return 0;
    const uint64_t head = rb->head.load(std::memory_order_relaxed);
    const uint64_t tail = rb->tail.load(std::memory_order_acquire);
    if (head - tail >= rb->capacity) return 0;  // full
    std::memcpy(rb->storage.data() + (head % rb->capacity) * rb->frame_bytes,
                frame, bytes);
    rb->head.store(head + 1, std::memory_order_release);
    return 1;
}

// Returns 1 on success, 0 when the ring is empty.
int ftk_ring_pop(void* handle, uint8_t* out, size_t bytes) {
    auto* rb = static_cast<RingBuffer*>(handle);
    if (bytes != rb->frame_bytes) return 0;
    const uint64_t tail = rb->tail.load(std::memory_order_relaxed);
    const uint64_t head = rb->head.load(std::memory_order_acquire);
    if (head == tail) return 0;  // empty
    std::memcpy(out,
                rb->storage.data() + (tail % rb->capacity) * rb->frame_bytes,
                bytes);
    rb->tail.store(tail + 1, std::memory_order_release);
    return 1;
}

// --------------------------------------------------------- image helpers
void ftk_u8_to_f32(const uint8_t* src, float* dst, size_t n) {
    for (size_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]);
}

// One pyramid level: 2x2 average of the even-cropped image, floored to an
// integer gray value (the reference pyramid stores uint8 per level, so
// every downsample truncates; ops/pyramid.py quantize=True mirrors this).
void ftk_pyramid_down(const float* src, int64_t h, int64_t w, float* dst) {
    const int64_t h2 = (h / 2) * 2;
    const int64_t w2 = (w / 2) * 2;
    const int64_t oh = h2 / 2;
    const int64_t ow = w2 / 2;
    for (int64_t r = 0; r < oh; ++r) {
        const float* r0 = src + (2 * r) * w;
        const float* r1 = src + (2 * r + 1) * w;
        float* out = dst + r * ow;
        for (int64_t c = 0; c < ow; ++c) {
            const float acc = r0[2 * c] + r0[2 * c + 1] + r1[2 * c] +
                              r1[2 * c + 1];
            out[c] = static_cast<float>(static_cast<int64_t>(acc * 0.25f));
        }
    }
}

// Fused convert + full pyramid build into caller-provided level buffers
// (levels stacked: out_ptrs[i] receives level i of size computed by the
// caller). Level 0 is the float copy of the input.
void ftk_convert_and_pyramid(const uint8_t* src, int64_t h, int64_t w,
                             int64_t levels, float** out_ptrs) {
    ftk_u8_to_f32(src, out_ptrs[0], static_cast<size_t>(h) * w);
    int64_t lh = h, lw = w;
    for (int64_t l = 1; l < levels; ++l) {
        ftk_pyramid_down(out_ptrs[l - 1], lh, lw, out_ptrs[l]);
        lh /= 2;
        lw /= 2;
    }
}

}  // extern "C"
