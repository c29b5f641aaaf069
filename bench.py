#!/usr/bin/env python
"""Benchmark: per-position two-sample test battery throughput (sites/sec).

Workload: the detect hot path at E. coli scale — P genome positions with
~C-deep signal pools per group, full KS + Mann-Whitney U + Welch-t battery
plus weighted-Stouffer neighbor combination and ranking.

Baseline: the reference implementation's per-position scipy loop
(ref bin/scripts/myDetect.py:416-438 runs mannwhitneyu + ttest_ind +
ks_2samp one position at a time, single-threaded), measured on a sample
here and extrapolated.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_ours(values1, counts1, values2, counts2, positions, repeat=3):
    from nanomod_tpu.stats.battery import run_battery
    from nanomod_tpu.stats.combine import combine_neighbor_pvalues
    from nanomod_tpu.config import StatConfig

    cfg = StatConfig()
    gid = np.zeros(len(positions), dtype=np.int64)

    def once():
        res = run_battery(values1, counts1, values2, counts2,
                          cfg=cfg, tile_positions=32768)
        stc, pc = combine_neighbor_pvalues(gid, positions, res.pks, cfg)
        order = np.lexsort((res.pu, res.pks, pc))
        return order[0]

    once()  # warmup/compile
    t0 = time.time()
    for _ in range(repeat):
        once()
    dt = (time.time() - t0) / repeat
    return len(positions) / dt


def bench_reference_equiv(values1, counts1, values2, counts2, sample=300):
    """Reference-equivalent cost: per-position scipy calls in a Python loop
    (the reference's exact structure, myDetect.py:430-436)."""
    from scipy.stats import mannwhitneyu, ttest_ind, ks_2samp
    n = min(sample, len(counts1))
    t0 = time.time()
    for i in range(n):
        a = values1[i, : counts1[i]].astype(np.float64)
        b = values2[i, : counts2[i]].astype(np.float64)
        try:
            mannwhitneyu(a, b)
        except ValueError:
            pass
        ttest_ind(a, b, equal_var=False)
        ks_2samp(a, b, method="asymp")
    dt = time.time() - t0
    return n / dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

    p_total = int(os.environ.get("BENCH_POSITIONS", 200_000))
    cov = int(os.environ.get("BENCH_COVERAGE", 50))
    rng = np.random.default_rng(0)
    c_max = cov + 14
    counts1 = rng.integers(cov - 10, c_max, p_total).astype(np.int32)
    counts2 = rng.integers(cov - 10, c_max, p_total).astype(np.int32)
    values1 = np.round(rng.normal(0, 1, (p_total, c_max)), 3).astype(np.float32)
    values2 = np.round(rng.normal(0, 1, (p_total, c_max)), 3).astype(np.float32)
    positions = np.arange(p_total, dtype=np.int64)

    ours = bench_ours(values1, counts1, values2, counts2, positions)
    ref = bench_reference_equiv(values1, counts1, values2, counts2)

    print(json.dumps({
        "metric": "sites_tested_per_sec",
        "value": round(ours, 1),
        "unit": "sites/s",
        "vs_baseline": round(ours / ref, 2),
    }))


if __name__ == "__main__":
    main()
