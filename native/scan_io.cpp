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
// Error contract: kisstpu_read_scan / kisstpu_prefetcher_next return -1 at
// end-of-sequence / unreadable input respectively; the prefetcher surfaces a
// failed or undecodable file as -2 for THAT position (the Python wrapper
// raises) instead of silently yielding an empty scan — an empty frame would
// register against the map and corrupt the trajectory with no error.
//
// Build: make native  (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <exception>
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
    // fseek/ftell can fail (FIFOs, devices): ftell's -1 would otherwise turn
    // into resize(SIZE_MAX) and an exception on a worker thread.
    if (std::fseek(f, 0, SEEK_END) != 0) { std::fclose(f); return false; }
    long size = std::ftell(f);
    if (size < 0 || std::fseek(f, 0, SEEK_SET) != 0) {
        std::fclose(f);
        return false;
    }
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

// Defined-behavior typed load from the raw file buffer (a reinterpret_cast
// dereference would violate strict aliasing; memcpy compiles to the same
// single load under -O3).
template <typename T>
inline T load_as(const uint8_t *p) {
    T v;
    std::memcpy(&v, p, sizeof(T));
    return v;
}

// KITTI / MulRan: float32 records (x, y, z, intensity).
int64_t decode_f32_stride(const uint8_t *data, size_t bytes, int stride_floats,
                          float *out_xyz, int64_t capacity) {
    const size_t rec = sizeof(float) * static_cast<size_t>(stride_floats);
    int64_t n_rec = static_cast<int64_t>(bytes / rec);  // floor partial tail
    int64_t out = 0;
    for (int64_t i = 0; i < n_rec && out < capacity; ++i) {
        const uint8_t *r = data + static_cast<size_t>(i) * rec;
        float x = load_as<float>(r + 0);
        float y = load_as<float>(r + 4);
        float z = load_as<float>(r + 8);
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
    const size_t rec = sizeof(int16_t) * 4;
    int64_t n_rec = static_cast<int64_t>(bytes / rec);
    int64_t out = 0;
    for (int64_t i = 0; i < n_rec && out < capacity; ++i) {
        const uint8_t *r = data + static_cast<size_t>(i) * rec;
        float x = static_cast<float>(load_as<int16_t>(r + 0)) * 0.005f - 100.0f;
        float y = static_cast<float>(load_as<int16_t>(r + 2)) * 0.005f - 100.0f;
        float z = static_cast<float>(load_as<int16_t>(r + 4)) * 0.005f - 100.0f;
        out_xyz[out * 3 + 0] = x;
        out_xyz[out * 3 + 1] = -y;
        out_xyz[out * 3 + 2] = -z;
        ++out;
    }
    return out;
}

int64_t decode(int format, const uint8_t *data, size_t bytes, float *out_xyz,
               int64_t capacity) {
    switch (format) {
        case 0: return decode_f32_stride(data, bytes, 4, out_xyz, capacity);
        case 1: return decode_f32_stride(data, bytes, 6, out_xyz, capacity);
        case 2: return decode_nclt(data, bytes, out_xyz, capacity);
        default: return -1;
    }
}

// ---------- Prefetcher -----------------------------------------------------
// A bounded queue of decoded scans, filled by worker threads reading files in
// order. The consumer pops in order; workers stay ahead by `depth` scans.

struct Scan {
    std::vector<float> xyz;  // n * 3 (sized to the actual point count)
    int64_t n = 0;
    bool error = false;  // file unreadable / undecodable at this position
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
        // Reused across iterations: decoding into a fresh capacity*3 vector
        // per scan would value-initialize ~12 MB per frame at the default
        // capacity (pure memset churn on the latency-critical path).
        std::vector<uint8_t> buf;
        std::vector<float> decoded(static_cast<size_t>(capacity) * 3);
        while (!stop.load()) {
            size_t idx = next_fetch.fetch_add(1);
            if (idx >= files.size()) return;
            Scan scan;
            if (read_file(files[idx], buf)) {
                scan.n = decode(format, buf.data(), buf.size(), decoded.data(),
                                capacity);
            } else {
                scan.n = -1;
            }
            if (scan.n < 0) {
                scan.error = true;
                scan.n = 0;
            } else {
                scan.xyz.assign(decoded.begin(),
                                decoded.begin() + scan.n * 3);
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

    void worker_entry() {
        // An exception escaping a worker would std::terminate the whole
        // process; convert it into an error result for the position the
        // worker was handling (conservatively: just stop producing — the
        // consumer's error slot surfaces via the ready flag of later scans
        // never arriving is avoided by stopping the pool loudly instead).
        try {
            worker();
        } catch (const std::exception &) {
            std::lock_guard<std::mutex> lock(mu);
            worker_failed = true;
            cv_ready.notify_all();
        } catch (...) {
            std::lock_guard<std::mutex> lock(mu);
            worker_failed = true;
            cv_ready.notify_all();
        }
    }

    bool worker_failed = false;  // guarded by mu

    int64_t pop(float *out_xyz) {
        std::unique_lock<std::mutex> lock(mu);
        if (next_pop >= files.size()) return -1;
        size_t idx = next_pop;
        Scan &slot = slots[idx % depth];
        cv_ready.wait(lock, [&] {
            return slot.ready || worker_failed || stop.load();
        });
        if (!slot.ready) return -2;  // pool died / shutdown mid-sequence
        if (slot.error) {
            slot.ready = false;
            next_pop++;
            cv_free.notify_all();
            return -2;  // this position failed; caller raises with the path
        }
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
    try {
        std::vector<uint8_t> buf;
        if (!read_file(path, buf)) return -1;
        return decode(format, buf.data(), buf.size(), out_xyz, capacity);
    } catch (...) {
        return -1;  // never unwind across the C ABI into ctypes
    }
}

void *kisstpu_prefetcher_create(const char **paths, int64_t n_paths, int format,
                                int64_t capacity, int64_t depth,
                                int64_t n_threads) {
    try {
        auto *p = new Prefetcher();
        p->files.assign(paths, paths + n_paths);
        p->format = format;
        p->capacity = capacity;
        p->depth = static_cast<size_t>(depth > 0 ? depth : 4);
        p->slots.resize(p->depth);
        int64_t nt = n_threads > 0 ? n_threads : 2;
        for (int64_t i = 0; i < nt; ++i)
            p->workers.emplace_back(&Prefetcher::worker_entry, p);
        return p;
    } catch (...) {
        return nullptr;
    }
}

// Blocks until the next scan (in order) is decoded; returns its point count,
// -1 at end of sequence, or -2 when that position's file failed to
// read/decode (or the pool died).
int64_t kisstpu_prefetcher_next(void *handle, float *out_xyz) {
    try {
        return static_cast<Prefetcher *>(handle)->pop(out_xyz);
    } catch (...) {
        return -2;
    }
}

void kisstpu_prefetcher_destroy(void *handle) {
    auto *p = static_cast<Prefetcher *>(handle);
    {
        // stop must flip under the mutex: a worker that already evaluated
        // its wait predicate but has not yet blocked would otherwise miss
        // the notify forever (lost wakeup -> join() deadlocks).
        std::lock_guard<std::mutex> lock(p->mu);
        p->stop.store(true);
    }
    p->cv_free.notify_all();
    p->cv_ready.notify_all();
    for (auto &t : p->workers) t.join();
    delete p;
}

}  // extern "C"
