"""Neighbor-aware p-value combination as a 1-D stencil.

The reference walks the sorted sign_test list and, for each position, gathers
the KS p-values of the ±k index-neighbors, substituting 1.0 whenever the
neighbor is out of range or not genomically contiguous (``pos_check``:
same chrom+strand and index-distance == coordinate-distance), then applies
scipy combine_pvalues with Fisher or geometric-weighted Stouffer
(ref bin/scripts/myDetect.py:366-414).

Here the joined positions arrive as parallel arrays already sorted by
(chrom, strand, pos) — the same iteration order the reference produces from
its sorted dict keys — and the stencil is fully vectorized.
"""

from __future__ import annotations

import numpy as np

from nanomod_tpu.config import StatConfig
from nanomod_tpu.stats import special


def neighbor_matrix(group_ids: np.ndarray, positions: np.ndarray,
                    pks: np.ndarray, k: int) -> np.ndarray:
    """[P, 2k+1] matrix of neighbor KS p-values with 1.0 for invalid slots.

    group_ids: int array identifying (chrom, strand) runs; positions: int64
    genomic coordinates; both sorted so that contiguous genome positions are
    adjacent rows.  Neighbor at offset j is valid iff same group and
    position difference == j (pos_check, ref myDetect.py:366-371).
    """
    p_total = len(pks)
    out = np.ones((p_total, 2 * k + 1), dtype=np.float64)
    for col, off in enumerate(range(-k, k + 1)):
        if off == 0:
            out[:, col] = pks
            continue
        src_lo = max(0, off)
        src_hi = p_total + min(0, off)
        if src_hi <= src_lo:
            continue
        dst = slice(src_lo - off, src_hi - off)
        src = slice(src_lo, src_hi)
        valid = (group_ids[src] == group_ids[dst]) & (
            positions[src] - positions[dst] == off
        )
        out[dst, col] = np.where(valid, pks[src], 1.0)
    return out


def combine_neighbor_pvalues(group_ids, positions, pks, cfg: StatConfig):
    """Combined (statistic, p-value) per position, or None when the
    configuration produces no combination column.

    Mirrors combin_pvalues/get_combin_pvalue semantics
    (ref myDetect.py:373-414): with neighborPvalues == 0 the KS column is
    reused verbatim; with testMethod == 'ks' the caller should not call this.
    """
    if cfg.test_method == "ks":
        return None
    if cfg.neighbor_pvalues == 0:
        # ref myDetect.py:413: the ks tuple itself is appended
        return None  # caller duplicates the KS column
    mat = neighbor_matrix(np.asarray(group_ids), np.asarray(positions),
                          np.asarray(pks, dtype=np.float64), cfg.neighbor_pvalues)
    if cfg.test_method == "fisher":
        combine = lambda m: special.fisher_combine(m, axis=1)
    else:
        w = special.stouffer_weights(cfg.neighbor_pvalues, cfg.weights_dif)
        combine = lambda m: special.stouffer_combine(m, w, axis=1)

    n = len(mat)
    if n > 1_000_000:
        # rows are independent and the scipy transforms (ndtri/chi2.sf)
        # release the GIL: chunk across threads.  Bitwise identical to the
        # single-pass result (pure per-row math).
        import os
        from concurrent.futures import ThreadPoolExecutor
        nthreads = min(8, os.cpu_count() or 1)
        bounds = np.linspace(0, n, nthreads + 1, dtype=np.int64)
        with ThreadPoolExecutor(nthreads) as ex:
            parts = list(ex.map(
                lambda i: combine(mat[bounds[i]:bounds[i + 1]]),
                range(nthreads)))
        stat = np.concatenate([p[0] for p in parts])
        p = np.concatenate([p[1] for p in parts])
    else:
        stat, p = combine(mat)
    return special.clamp_stat(stat), special.clamp_p(p)
