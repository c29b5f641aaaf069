#!/usr/bin/env python
"""Diagnostic: split the battery bench into device-compute vs link cost.

Measures, on the real chip:
  * pure device battery kernel time on RESIDENT tiles (block_until_ready
    deltas over a warm loop) -> device_sites_per_sec
  * H2D bandwidth (device_put of bench-shaped int16 tiles, blocked)
  * D2H fetch latency of the packed [9, P] output
  * full run_battery wall at competing tile sizes

Usage: python tools/bench_split.py [tile ...]
"""
import os
import sys
import time
import json

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from nanomod_tpu.stats import kernels


def measure(tile, cap=64, reps=7):
    rng = np.random.default_rng(0)
    v1 = (rng.normal(0, 1, (tile, cap)) * 1000).astype(np.int16)
    v2 = (rng.normal(0, 1, (tile, cap)) * 1000).astype(np.int16)
    c1 = rng.integers(40, cap, tile).astype(np.int32)
    c2 = rng.integers(40, cap, tile).astype(np.int32)

    # resident copies
    d1, d2 = jnp.asarray(v1), jnp.asarray(v2)
    dc1, dc2 = jnp.asarray(c1), jnp.asarray(c2)
    out = kernels.battery_components_packed_milli(d1, dc1, d2, dc2)
    out.block_until_ready()

    # pure device compute
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        kernels.battery_components_packed_milli(
            d1, dc1, d2, dc2).block_until_ready()
        ts.append(time.perf_counter() - t0)
    dev_s = float(np.median(ts))

    # H2D: push one fresh tile pair, blocked
    ts = []
    for i in range(reps):
        vv = v1 + np.int16(i)  # defeat any caching
        t0 = time.perf_counter()
        a = jax.device_put(vv)
        b = jax.device_put(v2)
        jax.block_until_ready((a, b))
        ts.append(time.perf_counter() - t0)
    h2d_s = float(np.median(ts))
    nbytes = v1.nbytes + v2.nbytes

    # D2H of the packed output
    ts = []
    for _ in range(reps):
        o = kernels.battery_components_packed_milli(d1, dc1, d2, dc2)
        o.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(o)
        ts.append(time.perf_counter() - t0)
    d2h_s = float(np.median(ts))

    return {"tile": tile,
            "device_s": round(dev_s, 5),
            "device_sites_per_s": round(tile / dev_s, 1),
            "h2d_s": round(h2d_s, 5),
            "h2d_MBps": round(nbytes / h2d_s / 1e6, 1),
            "d2h_s": round(d2h_s, 5)}


def full_wall(tile, p_total=200_000, cov=50, reps=5):
    from nanomod_tpu.stats.battery import run_battery
    from nanomod_tpu.stats.combine import combine_neighbor_pvalues
    from nanomod_tpu.config import StatConfig
    rng = np.random.default_rng(0)
    c_max = cov + 14
    counts1 = rng.integers(cov - 10, c_max, p_total).astype(np.int32)
    counts2 = rng.integers(cov - 10, c_max, p_total).astype(np.int32)
    values1 = np.round(rng.normal(0, 1, (p_total, c_max)), 3).astype(np.float32)
    values2 = np.round(rng.normal(0, 1, (p_total, c_max)), 3).astype(np.float32)
    positions = np.arange(p_total, dtype=np.int64)
    cfg = StatConfig()
    gid = np.zeros(p_total, dtype=np.int64)

    def once():
        res = run_battery(values1, counts1, values2, counts2,
                          cfg=cfg, tile_positions=tile)
        stc, pc = combine_neighbor_pvalues(gid, positions, res.pks, cfg)
        order = np.lexsort((res.pu, res.pks, pc))
        return order[0]

    once()
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        once()
        rates.append(p_total / (time.perf_counter() - t0))
    rates.sort()
    return {"tile": tile, "wall_sites_per_s": round(float(np.median(rates)), 1),
            "min": round(rates[0], 1), "max": round(rates[-1], 1)}


if __name__ == "__main__":
    tiles = [int(t) for t in sys.argv[1:]] or [8192, 16384]
    for t in tiles:
        print(json.dumps(measure(t)))
    for t in tiles:
        print(json.dumps(full_wall(t)))
