// Parallel LSD radix sort for u64 keys — the host-side pool-build hot loop.
//
// The detect pool build packs every (position, value, base) observation
// into one u64 key and needs them position-sorted (accum/pools.py
// _canonical_sort); numpy's introsort runs single-threaded at ~2.5 MB/s/key
// on the bench host and dominated E. coli-scale runs (57 s of a ~250 s
// wall, ref workload myDetect.py:122-124 accumulation).  This is a
// standard 8-bit-digit LSD radix sort with per-thread histograms and
// cooperative scatter: O(passes x n) with passes = occupied key bytes.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

typedef uint64_t u64;
typedef int64_t i64;

struct Barrier {
    std::atomic<int> count{0};
    std::atomic<int> phase{0};
    int n;
    explicit Barrier(int n_) : n(n_) {}
    void wait() {
        int ph = phase.load();
        if (count.fetch_add(1) + 1 == n) {
            count.store(0);
            phase.fetch_add(1);
        } else {
            while (phase.load() == ph) std::this_thread::yield();
        }
    }
};

}  // namespace

extern "C" {

// Sort keys[0..n) ascending, stable, using scratch[0..n).  The sorted
// result is left in keys.
void nm_radix_sort_u64(u64* keys, i64 n, u64* scratch, int nthreads) {
    if (n <= 1) return;
    int nt = std::max(1, std::min(nthreads, 32));
    if (n < (1 << 16)) {
        std::sort(keys, keys + n);
        return;
    }
    // which byte positions actually vary?  (skip constant digits)
    u64 all_or = 0, all_and = ~0ULL;
    {
        // cheap sample + full OR/AND reduction in parallel
        std::vector<std::thread> ts;
        std::vector<u64> ors(nt, 0), ands(nt, ~0ULL);
        i64 per = (n + nt - 1) / nt;
        for (int t = 0; t < nt; t++)
            ts.emplace_back([&, t]() {
                u64 o = 0, a = ~0ULL;
                for (i64 i = t * per; i < std::min(n, (t + 1) * per); i++) {
                    o |= keys[i];
                    a &= keys[i];
                }
                ors[t] = o; ands[t] = a;
            });
        for (auto& th : ts) th.join();
        for (int t = 0; t < nt; t++) { all_or |= ors[t]; all_and &= ands[t]; }
    }
    u64 varying = all_or & ~all_and;      // bits that differ across keys
    int passes[8], np_ = 0;
    for (int byte = 0; byte < 8; byte++)
        if ((varying >> (8 * byte)) & 0xFF) passes[np_++] = byte;
    if (np_ == 0) return;                 // all keys equal

    std::vector<i64> hist((size_t)nt * 256);
    Barrier bar(nt);
    u64* src = keys;
    u64* dst = scratch;
    i64 per = (n + nt - 1) / nt;

    std::vector<std::thread> ts;
    std::atomic<int> pass_idx{0};
    auto worker = [&](int t) {
        i64 lo = t * per, hi = std::min(n, (t + 1) * per);
        u64* s = src; u64* d = dst;
        for (int p = 0; p < np_; p++) {
            int shift = 8 * passes[p];
            i64* h = &hist[(size_t)t * 256];
            memset(h, 0, 256 * sizeof(i64));
            for (i64 i = lo; i < hi; i++) h[(s[i] >> shift) & 0xFF]++;
            bar.wait();
            if (t == 0) {
                // exclusive prefix over (digit, thread) in digit-major order
                i64 run = 0;
                for (int digit = 0; digit < 256; digit++)
                    for (int th = 0; th < nt; th++) {
                        i64 c = hist[(size_t)th * 256 + digit];
                        hist[(size_t)th * 256 + digit] = run;
                        run += c;
                    }
            }
            bar.wait();
            i64 offs[256];
            memcpy(offs, &hist[(size_t)t * 256], sizeof(offs));
            for (i64 i = lo; i < hi; i++)
                d[offs[(s[i] >> shift) & 0xFF]++] = s[i];
            std::swap(s, d);
            bar.wait();
        }
    };
    for (int t = 1; t < nt; t++) ts.emplace_back(worker, t);
    worker(0);
    for (auto& th : ts) th.join();
    if (np_ & 1) memcpy(keys, scratch, (size_t)n * sizeof(u64));
}

}  // extern "C"
