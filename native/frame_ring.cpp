// Native frame transport for hopperrender_tpu.
//
// TPU-native equivalent of the reference's sample/buffer machinery:
//   * CCustomAllocator / CMemAllocator fixed-size sample pool
//     (ref: CustomAllocator.cpp:23-113, HopperRender.cpp:529-541 — 5 output buffers)
//     -> a preallocated slab of frame slots.
//   * The DirectShow push-model transport between filter pins
//     (ref: common/baseclasses transfrm.cpp:302-380)
//     -> a lock-free SPSC ring of frame slots with blocking push/pop for the
//        decode-thread -> engine-thread pipeline.
//   * Input-stride compaction done on the CPU before upload
//     (ref: stride handling HopperRender.cpp:740-758,851-865)
//     -> strided NV12/P010 <-> tight-plane repack, memcpy row loops.
//
// Exposed as a plain C ABI for ctypes. Single producer, single consumer per ring.

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <new>

extern "C" {

// ---------------------------------------------------------------------------
// Strided NV12/P010 repacking
// ---------------------------------------------------------------------------

// Split a packed frame (Y plane: h rows of `stride` samples, then interleaved UV
// plane: h/2 rows) into tight planes. elem = bytes per sample (1 SDR, 2 HDR).
void hrt_unpack(const uint8_t* src, int64_t h, int64_t w, int64_t stride,
                int64_t elem, uint8_t* y_out, uint8_t* uv_out) {
    const int64_t row_bytes = w * elem;
    const int64_t stride_bytes = stride * elem;
    const uint8_t* src_y = src;
    const uint8_t* src_uv = src + h * stride_bytes;
    for (int64_t r = 0; r < h; ++r)
        std::memcpy(y_out + r * row_bytes, src_y + r * stride_bytes, row_bytes);
    for (int64_t r = 0; r < h / 2; ++r)
        std::memcpy(uv_out + r * row_bytes, src_uv + r * stride_bytes, row_bytes);
}

// Inverse: tight planes -> packed frame with output stride; padding bytes zeroed.
void hrt_pack(const uint8_t* y, const uint8_t* uv, int64_t h, int64_t w,
              int64_t stride, int64_t elem, uint8_t* dst) {
    const int64_t row_bytes = w * elem;
    const int64_t stride_bytes = stride * elem;
    uint8_t* dst_y = dst;
    uint8_t* dst_uv = dst + h * stride_bytes;
    const int64_t pad = stride_bytes - row_bytes;
    for (int64_t r = 0; r < h; ++r) {
        std::memcpy(dst_y + r * stride_bytes, y + r * row_bytes, row_bytes);
        if (pad) std::memset(dst_y + r * stride_bytes + row_bytes, 0, pad);
    }
    for (int64_t r = 0; r < h / 2; ++r) {
        std::memcpy(dst_uv + r * stride_bytes, uv + r * row_bytes, row_bytes);
        if (pad) std::memset(dst_uv + r * stride_bytes + row_bytes, 0, pad);
    }
}

// ---------------------------------------------------------------------------
// SPSC frame ring (fixed-size slots, blocking or timed push/pop)
// ---------------------------------------------------------------------------

struct FrameRing {
    uint8_t* slab = nullptr;
    int64_t slot_bytes = 0;     // payload capacity per slot
    int64_t* sizes = nullptr;   // actual payload size per slot
    int64_t* meta = nullptr;    // 4 int64 metadata words per slot (pts, flags, ...)
    int64_t capacity = 0;       // number of slots (power of two not required)
    std::atomic<int64_t> head{0};  // next slot to pop (consumer)
    std::atomic<int64_t> tail{0};  // next slot to push (producer)
    std::atomic<bool> closed{false};
    std::mutex mu;
    std::condition_variable cv_push;  // signalled on pop (space available)
    std::condition_variable cv_pop;   // signalled on push (data available)
};

constexpr int kMetaWords = 4;

FrameRing* hrt_ring_create(int64_t capacity, int64_t slot_bytes) {
    if (capacity <= 0 || slot_bytes <= 0) return nullptr;
    auto* r = new (std::nothrow) FrameRing();
    if (!r) return nullptr;
    r->slab = new (std::nothrow) uint8_t[capacity * slot_bytes];
    r->sizes = new (std::nothrow) int64_t[capacity]();
    r->meta = new (std::nothrow) int64_t[capacity * kMetaWords]();
    if (!r->slab || !r->sizes || !r->meta) {
        delete[] r->slab; delete[] r->sizes; delete[] r->meta; delete r;
        return nullptr;
    }
    r->slot_bytes = slot_bytes;
    r->capacity = capacity;
    return r;
}

void hrt_ring_destroy(FrameRing* r) {
    if (!r) return;
    delete[] r->slab;
    delete[] r->sizes;
    delete[] r->meta;
    delete r;
}

int64_t hrt_ring_size(const FrameRing* r) {
    return r->tail.load(std::memory_order_acquire) -
           r->head.load(std::memory_order_acquire);
}

void hrt_ring_close(FrameRing* r) {
    {
        std::lock_guard<std::mutex> lk(r->mu);
        r->closed.store(true, std::memory_order_release);
    }
    r->cv_pop.notify_all();
    r->cv_push.notify_all();
}

int hrt_ring_closed(const FrameRing* r) {
    return r->closed.load(std::memory_order_acquire) ? 1 : 0;
}

// Push: copies `size` payload bytes + 4 metadata words. timeout_ms < 0 blocks
// forever; 0 = non-blocking. Returns 0 ok, -1 timeout/full, -2 closed, -3 oversize.
int hrt_ring_push(FrameRing* r, const uint8_t* data, int64_t size,
                  const int64_t* meta, int64_t timeout_ms) {
    if (size > r->slot_bytes) return -3;
    std::unique_lock<std::mutex> lk(r->mu);
    auto full = [&] { return hrt_ring_size(r) >= r->capacity; };
    if (full()) {
        if (timeout_ms == 0) return -1;
        auto pred = [&] { return !full() || r->closed.load(); };
        if (timeout_ms < 0) {
            r->cv_push.wait(lk, pred);
        } else if (!r->cv_push.wait_for(lk, std::chrono::milliseconds(timeout_ms), pred)) {
            return -1;
        }
    }
    if (r->closed.load(std::memory_order_acquire)) return -2;
    const int64_t t = r->tail.load(std::memory_order_relaxed);
    const int64_t slot = t % r->capacity;
    std::memcpy(r->slab + slot * r->slot_bytes, data, size);
    r->sizes[slot] = size;
    for (int i = 0; i < kMetaWords; ++i)
        r->meta[slot * kMetaWords + i] = meta ? meta[i] : 0;
    r->tail.store(t + 1, std::memory_order_release);
    lk.unlock();
    r->cv_pop.notify_one();
    return 0;
}

// Pop into `data` (slot_bytes capacity). Returns payload size, or -1 timeout,
// -2 closed-and-drained.
int64_t hrt_ring_pop(FrameRing* r, uint8_t* data, int64_t* meta, int64_t timeout_ms) {
    std::unique_lock<std::mutex> lk(r->mu);
    auto empty = [&] { return hrt_ring_size(r) == 0; };
    if (empty()) {
        if (r->closed.load()) return -2;
        if (timeout_ms == 0) return -1;
        auto pred = [&] { return !empty() || r->closed.load(); };
        if (timeout_ms < 0) {
            r->cv_pop.wait(lk, pred);
        } else if (!r->cv_pop.wait_for(lk, std::chrono::milliseconds(timeout_ms), pred)) {
            return -1;
        }
        if (empty()) return -2;  // closed and drained
    }
    const int64_t h = r->head.load(std::memory_order_relaxed);
    const int64_t slot = h % r->capacity;
    const int64_t size = r->sizes[slot];
    std::memcpy(data, r->slab + slot * r->slot_bytes, size);
    if (meta)
        for (int i = 0; i < kMetaWords; ++i) meta[i] = r->meta[slot * kMetaWords + i];
    r->head.store(h + 1, std::memory_order_release);
    lk.unlock();
    r->cv_push.notify_one();
    return size;
}

}  // extern "C"
