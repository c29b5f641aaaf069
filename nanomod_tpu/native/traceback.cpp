// Batch alignment traceback walker.
//
// Walks the 4-bit traceback codes produced by the banded DP
// (nanomod_tpu/resquiggle/banded.py banded_sw) for a whole batch of reads.
// Port of banded.traceback (the Python walker is the specification;
// tests/test_native.py compares them).
//
// Build: g++ -O3 -shared -fPIC -o libtraceback.so traceback.cpp

#include <cstdint>

namespace {
constexpr int H_ZERO = 0, H_DIAG = 1, H_E = 2, H_F = 3;
}

extern "C" int64_t traceback_one(
    const uint8_t* tb,      // [M, W] row-major
    int64_t m, int64_t w,
    int64_t best_i, int64_t best_k,
    // outputs (caller-allocated, capacity cap):
    int32_t* ops_type,      // 0=M (read i aligned to ref j), 1=I, 2=D
    int32_t* ops_a,         // read index (M, I) or ref j (D)
    int32_t* ops_b,         // ref j for M ops, -1 otherwise
    int64_t cap) {
    int64_t n = 0;
    int64_t i = best_i, k = best_k;
    int state = 0;          // 0=H, 1=E, 2=F
    while (i >= 0 && n < cap) {
        uint8_t bits = tb[i * w + k];
        int src = bits & 0b11;
        if (state == 0) {
            if (src == H_ZERO) break;
            if (src == H_DIAG) {
                ops_type[n] = 0;
                ops_a[n] = (int32_t)i;
                ops_b[n] = (int32_t)(i + k);
                ++n;
                i -= 1;
                if (i < 0) break;
            } else if (src == H_E) {
                state = 1;
            } else {
                state = 2;
            }
        } else if (state == 1) {
            ops_type[n] = 2;
            ops_a[n] = (int32_t)(i + k);
            ops_b[n] = -1;
            ++n;
            if (bits & 0b100) {
                k -= 1;
                state = 1;
            } else {
                k -= 1;
                state = 0;
            }
            if (k < 0) break;
        } else {
            ops_type[n] = 1;
            ops_a[n] = (int32_t)i;
            ops_b[n] = -1;
            ++n;
            bool up_ext = bits & 0b1000;
            i -= 1;
            k += 1;
            if (k >= w || i < 0) break;
            state = up_ext ? 2 : 0;
        }
    }
    // reverse into 5'->3' order
    for (int64_t a = 0, b = n - 1; a < b; ++a, --b) {
        int32_t t;
        t = ops_type[a]; ops_type[a] = ops_type[b]; ops_type[b] = t;
        t = ops_a[a]; ops_a[a] = ops_a[b]; ops_a[b] = t;
        t = ops_b[a]; ops_b[a] = ops_b[b]; ops_b[b] = t;
    }
    return n;
}
