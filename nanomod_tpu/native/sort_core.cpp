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
#include <cmath>
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

// Grouped variant for keys whose HIGH bits group the data (the pool-build
// composite key: position<<35 | monotone-float<<3 | code): LSD radix over
// bytes >= lo_byte only (<=4 scatter passes instead of 8), then run-local
// std::sort of each equal-high run in parallel.  Runs are tiny (coverage-
// sized) and contiguous, so the local sorts are cache-resident — measured
// ~2.5x the full 8-pass radix at 105M keys (the scatter's random writes
// across an 840 MB array dominate; halving the passes halves them and the
// local sort pass is nearly free).  Correct because bytes >= lo_byte are
// more significant than the rest: concatenating fully-sorted equal-high
// runs yields the global order.
void nm_radix_sort_u64_hi(u64* keys, i64 n, u64* scratch, int nthreads,
                          int lo_byte) {
    if (n <= 1) return;
    int nt = std::max(1, std::min(nthreads, 32));
    if (n < (1 << 16) || lo_byte <= 0 || lo_byte > 7) {
        std::sort(keys, keys + n);
        return;
    }
    const int hi_shift = 8 * lo_byte;
    // which high bytes vary?
    u64 all_or = 0, all_and = ~0ULL;
    {
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
    u64 varying = all_or & ~all_and;
    int passes[8], np_ = 0;
    for (int byte = lo_byte; byte < 8; byte++)
        if ((varying >> (8 * byte)) & 0xFF) passes[np_++] = byte;

    if (np_ > 0) {
        std::vector<i64> hist((size_t)nt * 256);
        Barrier bar(nt);
        u64* src = keys;
        u64* dst = scratch;
        i64 per = (n + nt - 1) / nt;
        std::vector<std::thread> ts;
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

    // parallel run-local sort: thread t owns every run that STARTS in
    // [t*per, (t+1)*per)
    {
        i64 per = (n + nt - 1) / nt;
        std::vector<std::thread> ts;
        auto worker = [&](int t) {
            i64 lo = t * per, hi = std::min(n, (t + 1) * per);
            if (lo >= n) return;
            // skip forward to the first run start at/after lo
            i64 i = lo;
            if (i > 0) {
                u64 h = keys[i - 1] >> hi_shift;
                while (i < hi && (keys[i] >> hi_shift) == h) i++;
            }
            while (i < hi) {
                u64 h = keys[i] >> hi_shift;
                i64 j = i + 1;
                while (j < n && (keys[j] >> hi_shift) == h) j++;
                if (j - i > 1) std::sort(keys + i, keys + j);
                i = j;
            }
        };
        for (int t = 1; t < nt; t++) ts.emplace_back(worker, t);
        worker(0);
        for (auto& th : ts) th.join();
    }
}

// Masked gather for the harness's mixing trials (harness/simulate.py
// FlatReads.select): out[j++] = key[i] for every i with keep[rid[i]].
// keep is a per-READ byte mask (tiny, cache-resident); key/rid are the
// group's sorted observation arrays.  Sortedness is preserved because the
// gather is order-preserving.  Returns the number gathered.
i64 nm_masked_gather_u64(const u64* key, const int32_t* rid, i64 n,
                         const uint8_t* keep, u64* out, int nthreads) {
    int nt = std::max(1, std::min(nthreads, 32));
    if (n < (1 << 16)) nt = 1;
    i64 per = (n + nt - 1) / nt;
    std::vector<i64> cnt(nt, 0);
    {
        std::vector<std::thread> ts;
        auto worker = [&](int t) {
            i64 lo = t * per, hi = std::min(n, (t + 1) * per), c = 0;
            for (i64 i = lo; i < hi; i++) c += keep[rid[i]] != 0;
            cnt[t] = c;
        };
        for (int t = 1; t < nt; t++) ts.emplace_back(worker, t);
        worker(0);
        for (auto& th : ts) th.join();
    }
    std::vector<i64> off(nt + 1, 0);
    for (int t = 0; t < nt; t++) off[t + 1] = off[t] + cnt[t];
    {
        std::vector<std::thread> ts;
        auto worker = [&](int t) {
            i64 lo = t * per, hi = std::min(n, (t + 1) * per);
            i64 j = off[t];
            for (i64 i = lo; i < hi; i++)
                if (keep[rid[i]]) out[j++] = key[i];
        };
        for (int t = 1; t < nt; t++) ts.emplace_back(worker, t);
        worker(0);
        for (auto& th : ts) th.join();
    }
    return off[nt];
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Host two-sample battery (stats/battery.py host backend).  Computes the
// SAME exact integer components as the device kernels
// (stats/kernels._pairwise_components + _milli_exact_sums): KS numerator
// max|le_a*n2 - le_b*n1|, doubled tie-averaged rank sum of group 1, tie
// correction sum Σ(t^3 - t) as Σ_elements(t^2 - 1), and exact milli-domain
// Σx / Σx² per group.  Used when the host<->device link is too slow to
// ship the raw pools (the tunneled-TPU bench topology: measured ~65 MB/s
// steady-state vs ~18 GB/s of HBM on-chip); selection lives in Python.
// Replaces the reference's per-position scipy loop (myDetect.py:416-438).

namespace {

// merge-walk of the two per-row sorted groups, advancing one tie-run of
// the POOLED sample at a time
struct RowStats {
    i64 ks_num, trs, ties, s1, sq1, s2, sq2;
};

inline void battery_row(const int16_t* a, int n1, const int16_t* b, int n2,
                        RowStats* out) {
    i64 ks = 0, trs = 0, ties = 0;
    int ia = 0, ib = 0;
    while (ia < n1 || ib < n2) {
        int v;
        if (ia < n1 && (ib >= n2 || a[ia] <= b[ib])) v = a[ia];
        else v = b[ib];
        int ka = 0, kb = 0;
        while (ia + ka < n1 && a[ia + ka] == v) ka++;
        while (ib + kb < n2 && b[ib + kb] == v) kb++;
        int t = ka + kb;
        i64 le_a = ia + ka, le_b = ib + kb;
        i64 le = le_a + le_b;          // #{pooled <= v}
        i64 lt = le - t;               // #{pooled <  v}
        i64 num = le_a * (i64)n2 - le_b * (i64)n1;
        if (num < 0) num = -num;
        if (num > ks) ks = num;
        // group-1 elements of this run: 2r = cnt_lt + cnt_le + 1 each
        trs += (i64)ka * (lt + le + 1);
        ties += (i64)t * ((i64)t * t - 1);
        ia += ka;
        ib += kb;
    }
    out->ks_num = ks;
    out->trs = trs;
    out->ties = ties;
}

}  // namespace

extern "C" {

// values* are the pool arrays [p_rows, c*] (row stride = c*): f32 when
// is_i16 is 0, int16 milli values when is_i16 is 1.  idx* (nullable)
// gather row r of the battery from pool row idx*[r] — the two-group join
// (detect.join_pools) passes its index arrays directly so no [P, C]
// fancy-index copies are materialized on the host.  counts* are the true
// per-BATTERY-row sizes (clamped to >= 1 with a zero value for empty
// rows, matching the device tiler's zero pad + count clamp).  On the f32
// path every valid value must satisfy the system-wide 3-decimal milli
// invariant (|v*1000| < 32767 and within 0.01 of an integer after
// rounding, ref myRefBaseSignalAnnotation.py:259); on failure the
// function returns 1 WITHOUT filling outputs (caller falls back to the
// device f32 path).  Returns 0 on success.
int nm_battery_milli(const void* values1v, const int32_t* counts1, i64 c1,
                     const void* values2v, const int32_t* counts2, i64 c2,
                     i64 p, int is_i16,
                     const i64* idx1, const i64* idx2,
                     int32_t* ks_num, int32_t* trs, int32_t* ties,
                     i64* s1, i64* sq1, i64* s2, i64* sq2,
                     int nthreads) {
    const float* values1 = (const float*)values1v;
    const float* values2 = (const float*)values2v;
    const int16_t* ivalues1 = (const int16_t*)values1v;
    const int16_t* ivalues2 = (const int16_t*)values2v;
    int nt = std::max(1, std::min(nthreads, 32));
    i64 per = (p + nt - 1) / nt;
    std::atomic<i64> bad{-1};
    std::vector<std::thread> ts;
    auto worker = [&](int t) {
        std::vector<int16_t> buf1((size_t)c1), buf2((size_t)c2);
        i64 lo = t * per, hi = std::min(p, (t + 1) * per);
        for (i64 r = lo; r < hi; r++) {
            if (bad.load(std::memory_order_relaxed) >= 0) return;
            int n1 = counts1[r] < 1 ? 1 : counts1[r];
            int n2 = counts2[r] < 1 ? 1 : counts2[r];
            if (n1 > c1) n1 = (int)c1;
            if (n2 > c2) n2 = (int)c2;
            i64 row1 = idx1 ? idx1[r] : r;
            i64 row2 = idx2 ? idx2[r] : r;
            i64 ls1 = 0, lq1 = 0, ls2 = 0, lq2 = 0;
            if (is_i16) {
                const int16_t* v1 = ivalues1 + row1 * c1;
                const int16_t* v2 = ivalues2 + row2 * c2;
                for (int i = 0; i < n1; i++) {
                    int16_t m = counts1[r] < 1 ? (int16_t)0 : v1[i];
                    buf1[i] = m;
                    ls1 += m; lq1 += (i64)m * m;
                }
                for (int i = 0; i < n2; i++) {
                    int16_t m = counts2[r] < 1 ? (int16_t)0 : v2[i];
                    buf2[i] = m;
                    ls2 += m; lq2 += (i64)m * m;
                }
            } else {
                const float* v1 = values1 + row1 * c1;
                const float* v2 = values2 + row2 * c2;
                for (int i = 0; i < n1; i++) {
                    float v = counts1[r] < 1 ? 0.0f : v1[i];
                    float sc = v * 1000.0f;
                    float rd = nearbyintf(sc);
                    if (!(fabsf(sc) < 32767.0f) || !(fabsf(sc - rd) < 0.01f)) {
                        bad.store(r); return;
                    }
                    int16_t m = (int16_t)rd;
                    buf1[i] = m;
                    ls1 += m; lq1 += (i64)m * m;
                }
                for (int i = 0; i < n2; i++) {
                    float v = counts2[r] < 1 ? 0.0f : v2[i];
                    float sc = v * 1000.0f;
                    float rd = nearbyintf(sc);
                    if (!(fabsf(sc) < 32767.0f) || !(fabsf(sc - rd) < 0.01f)) {
                        bad.store(r); return;
                    }
                    int16_t m = (int16_t)rd;
                    buf2[i] = m;
                    ls2 += m; lq2 += (i64)m * m;
                }
            }
            std::sort(buf1.begin(), buf1.begin() + n1);
            std::sort(buf2.begin(), buf2.begin() + n2);
            RowStats st;
            battery_row(buf1.data(), n1, buf2.data(), n2, &st);
            ks_num[r] = (int32_t)st.ks_num;
            trs[r] = (int32_t)st.trs;
            ties[r] = (int32_t)st.ties;
            s1[r] = ls1; sq1[r] = lq1;
            s2[r] = ls2; sq2[r] = lq2;
        }
    };
    for (int t = 1; t < nt; t++) ts.emplace_back(worker, t);
    worker(0);
    for (auto& th : ts) th.join();
    return bad.load() >= 0 ? 1 : 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused pool-build passes (accum/pools.pack_observations fast path).  The
// numpy pipeline spent ~45 s per 105M observations in ~30 single-threaded
// elementwise passes (key build, monotone float transforms, astype churn,
// repeat/arange, fancy-index scatter); these three functions do the same
// work in 4 threaded passes around one numpy SIMD sort.

namespace {
typedef uint32_t u32;

inline u32 float_monotone(float v) {
    u32 u;
    memcpy(&u, &v, 4);
    return (u & 0x80000000u) ? ~u : (u | 0x80000000u);
}

inline float monotone_float(u32 m) {
    u32 u = (m & 0x80000000u) ? (m ^ 0x80000000u) : ~m;
    float v;
    memcpy(&v, &u, 4);
    return v;
}

}  // namespace

extern "C" {

// key[i] = (pos[i]-pmin)<<35 | monotone(val[i])<<3 | (cod[i]&7)
void nm_pack_key(const i64* pos, const float* val, const int8_t* cod,
                 i64 n, i64 pmin, u64* key, int nthreads) {
    int nt = std::max(1, std::min(nthreads, 32));
    i64 per = (n + nt - 1) / nt;
    std::vector<std::thread> ts;
    auto worker = [&](int t) {
        i64 lo = t * per, hi = std::min(n, (t + 1) * per);
        for (i64 i = lo; i < hi; i++)
            key[i] = ((u64)(pos[i] - pmin) << 35)
                     | ((u64)float_monotone(val[i]) << 3)
                     | ((u64)cod[i] & 7);
    };
    for (int t = 1; t < nt; t++) ts.emplace_back(worker, t);
    worker(0);
    for (auto& th : ts) th.join();
}

// One pass over the SORTED keys: number of distinct positions and the
// deepest position's count.
i64 nm_pack_scan(const u64* key, i64 n, i64* cap_out) {
    if (n == 0) { *cap_out = 1; return 0; }
    i64 p_total = 1, cap = 1, run = 1;
    u64 prev = key[0] >> 35;
    for (i64 i = 1; i < n; i++) {
        u64 p = key[i] >> 35;
        if (p == prev) {
            run++;
        } else {
            if (run > cap) cap = run;
            run = 1;
            p_total++;
            prev = p;
        }
    }
    if (run > cap) cap = run;
    *cap_out = cap;
    return p_total;
}

// Fill uniq [P] i64, counts [P] i32, values [P,cap] f32 (zero padded),
// base_code [P] u8 (majority vote over 5 codes, first-max wins like
// np.argmax) from the sorted keys.  Threaded: each thread owns the runs
// STARTING in its range; row indices come from a counted prefix.
void nm_pack_fill(const u64* key, i64 n, i64 pmin, i64 cap,
                  i64* uniq, int32_t* counts, float* values,
                  uint8_t* base_code, int nthreads) {
    if (n == 0) return;
    int nt = std::max(1, std::min(nthreads, 32));
    i64 per = (n + nt - 1) / nt;
    // pass 1: run starts per thread range (a run starts at i==0 or where
    // the position changes)
    std::vector<i64> starts(nt, 0);
    {
        std::vector<std::thread> ts;
        auto worker = [&](int t) {
            i64 lo = t * per, hi = std::min(n, (t + 1) * per);
            i64 c = 0;
            for (i64 i = lo; i < hi; i++)
                if (i == 0 || (key[i] >> 35) != (key[i - 1] >> 35)) c++;
            starts[t] = c;
        };
        for (int t = 1; t < nt; t++) ts.emplace_back(worker, t);
        worker(0);
        for (auto& th : ts) th.join();
    }
    std::vector<i64> row0(nt + 1, 0);
    for (int t = 0; t < nt; t++) row0[t + 1] = row0[t] + starts[t];
    // pass 2: fill (each thread walks the full runs that start in its
    // range; memset of each row's tail keeps the zero pad)
    {
        std::vector<std::thread> ts;
        auto worker = [&](int t) {
            i64 lo = t * per, hi = std::min(n, (t + 1) * per);
            if (lo >= n) return;
            i64 i = lo;
            if (i > 0) {            // skip a run begun in the previous range
                u64 h = key[i - 1] >> 35;
                while (i < hi && (key[i] >> 35) == h) i++;
            }
            i64 row = row0[t];
            while (i < hi) {
                u64 h = key[i] >> 35;
                i64 votes[5] = {0, 0, 0, 0, 0};
                float* vrow = values + row * cap;
                i64 j = i;
                for (; j < n && (key[j] >> 35) == h; j++) {
                    vrow[j - i] = monotone_float(
                        (u32)((key[j] >> 3) & 0xFFFFFFFFu));
                    int c = (int)(key[j] & 7);
                    votes[c > 4 ? 4 : c]++;
                }
                for (i64 z = j - i; z < cap; z++) vrow[z] = 0.0f;
                uniq[row] = (i64)h + pmin;
                counts[row] = (int32_t)(j - i);
                int bc = 0;
                for (int c = 1; c < 5; c++)
                    if (votes[c] > votes[bc]) bc = c;
                base_code[row] = (uint8_t)bc;
                row++;
                i = j;
            }
        };
        for (int t = 1; t < nt; t++) ts.emplace_back(worker, t);
        worker(0);
        for (auto& th : ts) th.join();
    }
}

}  // extern "C"
