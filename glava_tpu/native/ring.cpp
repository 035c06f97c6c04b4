// Native host runtime: audio ring buffer + FIFO capture thread.
//
// Plays the role of the reference's C host layer (glava/fifo.c,
// glava/pulse_input.c, the ring handoff at glava/glava.c:528-537), but
// designed for a device-feeding pipeline instead of a render thread:
//
//  * seqlock ring: the writer never blocks on the reader; the reader
//    takes torn-free snapshots without stopping capture (the reference
//    holds one mutex across both sides).
//  * history is stored circularly; "shift left by hop" becomes a head
//    increment instead of a memmove of the whole window
//    (pulse_input.c:155-156 does O(bufsize) memmove per update).
//  * the FIFO reader implements the adaptive-timeout silence synthesis
//    of fifo.c:57-87 (stall -> zero-fill) in native code, so a Python
//    GIL pause can never starve capture.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cerrno>
#include <cmath>

#include <fcntl.h>
#include <poll.h>
#include <pthread.h>
#include <time.h>
#include <unistd.h>

namespace {

struct Ring {
    size_t bufsize;      // window length per channel
    size_t capacity;     // power-of-two >= 2*bufsize
    size_t mask;
    float* l;
    float* r;
    std::atomic<uint64_t> seq;     // seqlock: odd = write in progress
    std::atomic<uint64_t> head;    // absolute sample index of next write
    std::atomic<uint64_t> updates; // completed push count
};

size_t next_pow2(size_t v) {
    size_t p = 1;
    while (p < v) p <<= 1;
    return p;
}

}  // namespace

extern "C" {

Ring* gt_ring_new(size_t bufsize) {
    Ring* rg = new Ring();
    rg->bufsize = bufsize;
    rg->capacity = next_pow2(bufsize * 2);
    rg->mask = rg->capacity - 1;
    rg->l = (float*)calloc(rg->capacity, sizeof(float));
    rg->r = (float*)calloc(rg->capacity, sizeof(float));
    rg->seq.store(0);
    rg->head.store(0);
    rg->updates.store(0);
    return rg;
}

void gt_ring_free(Ring* rg) {
    if (!rg) return;
    free(rg->l);
    free(rg->r);
    delete rg;
}

// Writer side (single producer).
void gt_ring_push(Ring* rg, const float* l, const float* r, size_t n) {
    uint64_t s = rg->seq.load(std::memory_order_relaxed);
    rg->seq.store(s + 1, std::memory_order_release);  // mark write
    uint64_t h = rg->head.load(std::memory_order_relaxed);
    for (size_t i = 0; i < n; ++i) {
        size_t at = (h + i) & rg->mask;
        rg->l[at] = l[i];
        rg->r[at] = r[i];
    }
    rg->head.store(h + n, std::memory_order_relaxed);
    rg->updates.fetch_add(1, std::memory_order_relaxed);
    rg->seq.store(s + 2, std::memory_order_release);  // publish
}

// Mono mixdown push (`setmirror true` capture semantics,
// fifo.c:98-102: both channels get (l+r)/2).
void gt_ring_push_mono(Ring* rg, const float* l, const float* r, size_t n) {
    float tmp[4096];
    size_t done = 0;
    while (done < n) {
        size_t c = n - done < 4096 ? n - done : 4096;
        for (size_t i = 0; i < c; ++i)
            tmp[i] = (l[done + i] + r[done + i]) * 0.5f;
        gt_ring_push(rg, tmp, tmp, c);
        done += c;
    }
}

// Reader side: copy the trailing `bufsize` samples per channel
// (zero-padded before enough history exists). Returns the update
// counter; retries on concurrent writes (seqlock).
uint64_t gt_ring_snapshot(Ring* rg, float* out_l, float* out_r) {
    const size_t bs = rg->bufsize;
    for (;;) {
        uint64_t s0 = rg->seq.load(std::memory_order_acquire);
        if (s0 & 1) continue;  // write in progress
        uint64_t h = rg->head.load(std::memory_order_relaxed);
        uint64_t start = h >= bs ? h - bs : 0;
        size_t pad = h >= bs ? 0 : (size_t)(bs - h);
        if (pad) {
            memset(out_l, 0, pad * sizeof(float));
            memset(out_r, 0, pad * sizeof(float));
        }
        for (size_t i = 0; i < bs - pad; ++i) {
            size_t at = (start + i) & rg->mask;
            out_l[pad + i] = rg->l[at];
            out_r[pad + i] = rg->r[at];
        }
        uint64_t upd = rg->updates.load(std::memory_order_relaxed);
        uint64_t s1 = rg->seq.load(std::memory_order_acquire);
        if (s0 == s1) return upd;  // consistent snapshot
    }
}

uint64_t gt_ring_updates(Ring* rg) {
    return rg->updates.load(std::memory_order_relaxed);
}

// ---------------------------------------------------------------------------
// FIFO capture thread (fifo.c equivalent)
// ---------------------------------------------------------------------------

struct FifoReader {
    Ring* ring;
    char path[512];
    size_t hop;         // frames per push (samplesize / 4)
    int mono;
    float scale;        // reference uses 1/65535 for s16 (fifo.c:99-106)
    std::atomic<int> stop;
    pthread_t thread;
    std::atomic<int> running;
};

static void* fifo_thread(void* arg) {
    FifoReader* fr = (FifoReader*)arg;
    Ring* rg = fr->ring;
    const size_t hop = fr->hop;
    const size_t frame_bytes = hop * 2 * sizeof(int16_t);

    int fd = open(fr->path, O_RDONLY | O_NONBLOCK);
    if (fd < 0) {
        fr->running.store(-errno);
        return nullptr;
    }
    fr->running.store(1);

    int16_t* raw = (int16_t*)malloc(frame_bytes);
    float* lbuf = (float*)malloc(hop * sizeof(float));
    float* rbuf = (float*)malloc(hop * sizeof(float));
    size_t have = 0;

    // adaptive timeout: mean of the last 8 inter-read deltas, x2,
    // floored at 10ms (fifo.c:57-87)
    double deltas[8] = {0.05, 0.05, 0.05, 0.05, 0.05, 0.05, 0.05, 0.05};
    int didx = 0;
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    double last = ts.tv_sec + ts.tv_nsec * 1e-9;

    while (!fr->stop.load(std::memory_order_relaxed)) {
        double mean = 0;
        for (double d : deltas) mean += d;
        mean /= 8.0;
        int timeout_ms = (int)(mean * 2000.0);
        if (timeout_ms < 10) timeout_ms = 10;

        struct pollfd pfd = {fd, POLLIN, 0};
        int pr = poll(&pfd, 1, timeout_ms);
        if (pr == 0) {
            // producer stalled: synthesize silence
            memset(lbuf, 0, hop * sizeof(float));
            memset(rbuf, 0, hop * sizeof(float));
            gt_ring_push(rg, lbuf, rbuf, hop);
            continue;
        }
        if (pr < 0) break;
        ssize_t n = read(fd, (char*)raw + have, frame_bytes - have);
        if (n <= 0) {
            if (n == 0) {
                // Writer closed (poll reports POLLHUP immediately, so the
                // timeout branch never fires): treat like a stall — sleep
                // one timeout window and synthesize silence until a new
                // writer appears.
                struct timespec slp = {0, timeout_ms * 1000000L};
                nanosleep(&slp, nullptr);
                memset(lbuf, 0, hop * sizeof(float));
                memset(rbuf, 0, hop * sizeof(float));
                gt_ring_push(rg, lbuf, rbuf, hop);
            }
            continue;
        }
        have += (size_t)n;
        if (have < frame_bytes) continue;
        have = 0;

        clock_gettime(CLOCK_MONOTONIC, &ts);
        double now = ts.tv_sec + ts.tv_nsec * 1e-9;
        deltas[didx] = now - last;
        didx = (didx + 1) & 7;
        last = now;

        for (size_t i = 0; i < hop; ++i) {
            lbuf[i] = raw[2 * i] * fr->scale;
            rbuf[i] = raw[2 * i + 1] * fr->scale;
        }
        if (fr->mono)
            gt_ring_push_mono(rg, lbuf, rbuf, hop);
        else
            gt_ring_push(rg, lbuf, rbuf, hop);
    }
    free(raw);
    free(lbuf);
    free(rbuf);
    close(fd);
    fr->running.store(0);
    return nullptr;
}

FifoReader* gt_fifo_start(Ring* ring, const char* path, size_t hop,
                          int mono, float scale) {
    FifoReader* fr = new FifoReader();
    fr->ring = ring;
    strncpy(fr->path, path, sizeof(fr->path) - 1);
    fr->path[sizeof(fr->path) - 1] = '\0';
    fr->hop = hop;
    fr->mono = mono;
    fr->scale = scale;
    fr->stop.store(0);
    fr->running.store(0);
    if (pthread_create(&fr->thread, nullptr, fifo_thread, fr) != 0) {
        delete fr;
        return nullptr;
    }
    return fr;
}

int gt_fifo_running(FifoReader* fr) { return fr->running.load(); }

void gt_fifo_stop(FifoReader* fr) {
    if (!fr) return;
    fr->stop.store(1);
    pthread_join(fr->thread, nullptr);
    delete fr;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Frame IO helpers (streaming-sink hot path)
// ---------------------------------------------------------------------------

extern "C" {

// RGBA8 (bottom-up GL rows) -> planar YUV444 (top-down), BT.601 full
// range — the y4m streaming sink's per-frame conversion. Plain loops;
// the compiler vectorizes.
void gt_rgba_to_yuv444(const uint8_t* rgba, size_t w, size_t h,
                       uint8_t* y, uint8_t* u, uint8_t* v) {
    for (size_t row = 0; row < h; ++row) {
        const uint8_t* src = rgba + (h - 1 - row) * w * 4;  // flip
        uint8_t* yp = y + row * w;
        uint8_t* up = u + row * w;
        uint8_t* vp = v + row * w;
        for (size_t x = 0; x < w; ++x) {
            float r = src[4 * x + 0];
            float g = src[4 * x + 1];
            float b = src[4 * x + 2];
            float yy = 0.299f * r + 0.587f * g + 0.114f * b;
            float uu = -0.168736f * r - 0.331264f * g + 0.5f * b + 128.0f;
            float vv = 0.5f * r - 0.418688f * g - 0.081312f * b + 128.0f;
            yp[x] = (uint8_t)(yy < 0 ? 0 : (yy > 255 ? 255 : yy + 0.5f));
            up[x] = (uint8_t)(uu < 0 ? 0 : (uu > 255 ? 255 : uu + 0.5f));
            vp[x] = (uint8_t)(vv < 0 ? 0 : (vv > 255 ? 255 : vv + 0.5f));
        }
    }
}

// PNG scanline unfiltering (RFC 2083 §6): raw holds h rows of
// (1 filter byte + stride pixel bytes); out receives h*stride
// reconstructed bytes. Returns 0 on success, the offending filter
// type on error. Used by runtime/sinks.read_png for wallpaper-size
// images (the per-byte loops are pathological in Python).
int gt_png_unfilter(const uint8_t* raw, size_t h, size_t stride,
                    size_t nchan, uint8_t* out) {
    for (size_t y = 0; y < h; ++y) {
        const uint8_t* src = raw + y * (stride + 1);
        uint8_t ftype = src[0];
        const uint8_t* row = src + 1;
        uint8_t* dst = out + y * stride;
        const uint8_t* prev = y ? out + (y - 1) * stride : nullptr;
        switch (ftype) {
        case 0:
            for (size_t i = 0; i < stride; ++i) dst[i] = row[i];
            break;
        case 1:  // Sub
            for (size_t i = 0; i < stride; ++i) {
                uint8_t a = i >= nchan ? dst[i - nchan] : 0;
                dst[i] = (uint8_t)(row[i] + a);
            }
            break;
        case 2:  // Up
            for (size_t i = 0; i < stride; ++i) {
                uint8_t b = prev ? prev[i] : 0;
                dst[i] = (uint8_t)(row[i] + b);
            }
            break;
        case 3:  // Average
            for (size_t i = 0; i < stride; ++i) {
                unsigned a = i >= nchan ? dst[i - nchan] : 0;
                unsigned b = prev ? prev[i] : 0;
                dst[i] = (uint8_t)(row[i] + ((a + b) >> 1));
            }
            break;
        case 4:  // Paeth
            for (size_t i = 0; i < stride; ++i) {
                int a = i >= nchan ? dst[i - nchan] : 0;
                int b = prev ? prev[i] : 0;
                int c = (prev && i >= nchan) ? prev[i - nchan] : 0;
                int p = a + b - c;
                int pa = p > a ? p - a : a - p;
                int pb = p > b ? p - b : b - p;
                int pc = p > c ? p - c : c - p;
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                dst[i] = (uint8_t)(row[i] + pred);
            }
            break;
        default:
            return (int)ftype;
        }
    }
    return 0;
}

}  // extern "C"
