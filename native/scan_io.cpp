// Native scan IO + prefetch runtime for kiss_icp_tpu.
//
// Role: the host-side data path that feeds the TPU. The reference implements
// its runtime in C++ (cpp/kiss_icp/core/*); in this framework the compute core
// is JAX/XLA, and the native layer instead owns what remains on the host and
// is latency-critical at 100+ frames/s: file decode (KITTI/MulRan/Boreas/NCLT
// binary layouts), padding into the fixed-shape device staging buffer, and a
// background prefetch thread pool that overlaps disk IO with device compute.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment);
// Python-side wrapper: kiss_icp_tpu/io/native.py (with numpy fallback when
// this library is not built).
//
// Build: make native  (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------- Decoders -------------------------------------------------------
// Each decoder fills `out_xyz` (float32, capacity*3) and returns the number of
// points written (<= capacity). Invalid/NaN points are dropped.

bool read_file(const std::string &path, std::vector<uint8_t> &buf) {
    FILE *f = std::fopen(path.c_str(), "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    buf.resize(static_cast<size_t>(size));
    size_t got = std::fread(buf.data(), 1, buf.size(), f);
    std::fclose(f);
    return got == buf.size();
}

inline bool finite3(float x, float y, float z) {
    return x == x && y == y && z == z &&  // NaN check
           x < 1e30f && x > -1e30f && y < 1e30f && y > -1e30f && z < 1e30f &&
           z > -1e30f;
}

// KITTI / MulRan: float32 records (x, y, z, intensity).
int64_t decode_f32_stride(const uint8_t *data, size_t bytes, int stride_floats,
                          float *out_xyz, int64_t capacity) {
    const float *f = reinterpret_cast<const float *>(data);
    int64_t n_rec = static_cast<int64_t>(bytes / (sizeof(float) * stride_floats));
    int64_t out = 0;
    for (int64_t i = 0; i < n_rec && out < capacity; ++i) {
        float x = f[i * stride_floats + 0];
        float y = f[i * stride_floats + 1];
        float z = f[i * stride_floats + 2];
        if (!finite3(x, y, z)) continue;
        out_xyz[out * 3 + 0] = x;
        out_xyz[out * 3 + 1] = y;
        out_xyz[out * 3 + 2] = z;
        ++out;
    }
    return out;
}

// NCLT velodyne_sync: interleaved int16 (x, y, z, l), scaling 0.005 offset
// -100, axes flipped to z-up (reference nclt.py:61-83).
int64_t decode_nclt(const uint8_t *data, size_t bytes, float *out_xyz,
                    int64_t capacity) {
    const int16_t *s = reinterpret_cast<const int16_t *>(data);
    int64_t n_rec = static_cast<int64_t>(bytes / (sizeof(int16_t) * 4));
    int64_t out = 0;
    for (int64_t i = 0; i < n_rec && out < capacity; ++i) {
        float x = static_cast<float>(s[i * 4 + 0]) * 0.005f - 100.0f;
        float y = static_cast<float>(s[i * 4 + 1]) * 0.005f - 100.0f;
        float z = static_cast<float>(s[i * 4 + 2]) * 0.005f - 100.0f;
        out_xyz[out * 3 + 0] = x;
        out_xyz[out * 3 + 1] = -y;
        out_xyz[out * 3 + 2] = -z;
        ++out;
    }
    return out;
}

// ---------- Prefetcher -----------------------------------------------------
// A bounded queue of decoded scans, filled by worker threads reading files in
// order. The consumer pops in order; workers stay ahead by `depth` scans.

struct Scan {
    std::vector<float> xyz;  // n * 3
    int64_t n = 0;
    bool ready = false;
};

struct Prefetcher {
    std::vector<std::string> files;
    int format = 0;  // 0 = f32x4 (kitti), 1 = f32x6 (boreas), 2 = nclt
    int64_t capacity = 0;
    size_t depth = 4;

    std::vector<Scan> slots;          // ring buffer, size = depth
    std::atomic<size_t> next_fetch{0};  // next file index to fetch
    size_t next_pop = 0;              // next file index the consumer wants
    std::mutex mu;
    std::condition_variable cv_ready, cv_free;
    std::vector<std::thread> workers;
    std::atomic<bool> stop{false};

    void worker() {
        std::vector<uint8_t> buf;
        while (!stop.load()) {
            size_t idx = next_fetch.fetch_add(1);
            if (idx >= files.size()) return;
            Scan scan;
            scan.xyz.resize(static_cast<size_t>(capacity) * 3);
            if (read_file(files[idx], buf)) {
                switch (format) {
                    case 0:
                        scan.n = decode_f32_stride(buf.data(), buf.size(), 4,
                                                   scan.xyz.data(), capacity);
                        break;
                    case 1:
                        scan.n = decode_f32_stride(buf.data(), buf.size(), 6,
                                                   scan.xyz.data(), capacity);
                        break;
                    case 2:
                        scan.n = decode_nclt(buf.data(), buf.size(),
                                             scan.xyz.data(), capacity);
                        break;
                }
            }
            std::unique_lock<std::mutex> lock(mu);
            // Wait until this scan's ring slot is free (consumer caught up).
            cv_free.wait(lock, [&] {
                return stop.load() || idx < next_pop + depth;
            });
            if (stop.load()) return;
            Scan &slot = slots[idx % depth];
            slot = std::move(scan);
            slot.ready = true;
            cv_ready.notify_all();
        }
    }

    int64_t pop(float *out_xyz) {
        std::unique_lock<std::mutex> lock(mu);
        if (next_pop >= files.size()) return -1;
        size_t idx = next_pop;
        Scan &slot = slots[idx % depth];
        cv_ready.wait(lock, [&] { return slot.ready; });
        std::memcpy(out_xyz, slot.xyz.data(),
                    static_cast<size_t>(slot.n) * 3 * sizeof(float));
        int64_t n = slot.n;
        slot.ready = false;
        next_pop++;
        cv_free.notify_all();
        return n;
    }
};

}  // namespace

extern "C" {

// One-shot decode into a caller-provided buffer. Returns points written, or -1.
int64_t kisstpu_read_scan(const char *path, int format, float *out_xyz,
                          int64_t capacity) {
    std::vector<uint8_t> buf;
    if (!read_file(path, buf)) return -1;
    switch (format) {
        case 0: return decode_f32_stride(buf.data(), buf.size(), 4, out_xyz, capacity);
        case 1: return decode_f32_stride(buf.data(), buf.size(), 6, out_xyz, capacity);
        case 2: return decode_nclt(buf.data(), buf.size(), out_xyz, capacity);
        default: return -1;
    }
}

void *kisstpu_prefetcher_create(const char **paths, int64_t n_paths, int format,
                                int64_t capacity, int64_t depth,
                                int64_t n_threads) {
    auto *p = new Prefetcher();
    p->files.assign(paths, paths + n_paths);
    p->format = format;
    p->capacity = capacity;
    p->depth = static_cast<size_t>(depth > 0 ? depth : 4);
    p->slots.resize(p->depth);
    int64_t nt = n_threads > 0 ? n_threads : 2;
    for (int64_t i = 0; i < nt; ++i)
        p->workers.emplace_back(&Prefetcher::worker, p);
    return p;
}

// Blocks until the next scan (in order) is decoded; returns its point count,
// or -1 at end of sequence.
int64_t kisstpu_prefetcher_next(void *handle, float *out_xyz) {
    return static_cast<Prefetcher *>(handle)->pop(out_xyz);
}

void kisstpu_prefetcher_destroy(void *handle) {
    auto *p = static_cast<Prefetcher *>(handle);
    p->stop.store(true);
    p->cv_free.notify_all();
    p->cv_ready.notify_all();
    for (auto &t : p->workers) t.join();
    delete p;
}

}  // extern "C"
