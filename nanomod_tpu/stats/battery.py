"""Per-position two-sample test battery, tiled over positions.

Replaces the reference's per-position Python loop over scipy calls
(ref bin/scripts/myDetect.py:416-438 `mtest2` inner loop / :327-363
`getKStest`).  The device computes the sort/rank components for a whole tile
of positions at once (stats/kernels.py); the host applies float64 p-value
transforms (stats/special.py) and the trivially-vectorized Welch moments.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from nanomod_tpu.config import StatConfig
from nanomod_tpu.stats import kernels, special


@dataclass
class TestResult:
    """Per-position results, order-aligned with the caller's position list.

    Mirrors the reference's sign_test tuples
    ((chrom,strand,pos,base,cov1,cov2), [(stU,pU),(stT,pT),(stKS,pKS)[,(stC,pC)]])
    (ref myDetect.py:436) as dense arrays.
    """

    stu: np.ndarray
    pu: np.ndarray
    stt: np.ndarray
    pt: np.ndarray
    stks: np.ndarray
    pks: np.ndarray
    # filled by the caller via combine_neighbor_pvalues when applicable
    stcomb: np.ndarray | None = None
    pcomb: np.ndarray | None = None
    # optional per-group mean/std (--mstd, ref myDetect.py:437-438,540-544)
    mstd: np.ndarray | None = None

    def __len__(self):
        return len(self.stu)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _capacity_bucket(c: int) -> int:
    """Round a column capacity up to a power of two (min 8) so jit caches
    stay bounded."""
    c = max(c, 8)
    return 1 << (c - 1).bit_length()


def _inf_padded(values, counts, cap):
    """[Prows, cap] f32 with +inf beyond each row's count (host side)."""
    p = len(counts)
    out = np.full((p, cap), np.inf, dtype=np.float32)
    w = min(cap, values.shape[1])
    col = np.arange(w)[None, :]
    src = values[:, :w]
    out[:, :w] = np.where(col < counts[:, None], src, np.inf)
    return out


def run_battery(
    values1: np.ndarray,
    counts1: np.ndarray,
    values2: np.ndarray,
    counts2: np.ndarray,
    strand: str = "+",
    cfg: StatConfig = StatConfig(),
    tile_positions: int = 2048,
    want_mstd: bool = False,
) -> TestResult:
    """Run the full KS + MWU + Welch-t battery for P positions.

    values* are [P, C*] float32 pools with valid prefix lengths counts* [P]
    int32 (padding content is ignored).  `strand` selects the per-strand
    coverage cap (ref myDetect.py:339).
    """
    p_total = len(counts1)
    out = {
        k: np.empty(p_total, dtype=np.float64)
        for k in ("stu", "pu", "stt", "pt", "stks", "pks")
    }
    mstd = np.empty((p_total, 4), dtype=np.float64) if want_mstd else None
    cov = int(cfg.coverages[0 if strand == "+" else 1])

    for lo in range(0, p_total, tile_positions):
        hi = min(lo + tile_positions, p_total)
        n1 = counts1[lo:hi].astype(np.int32)
        n2 = counts2[lo:hi].astype(np.int32)
        c1 = _capacity_bucket(int(n1.max(initial=1)))
        c2 = _capacity_bucket(int(n2.max(initial=1)))
        p_tile = _round_up(hi - lo, 8)

        v1 = np.full((p_tile, c1), np.inf, dtype=np.float32)
        v2 = np.full((p_tile, c2), np.inf, dtype=np.float32)
        v1[: hi - lo] = _inf_padded(values1[lo:hi], n1, c1)
        v2[: hi - lo] = _inf_padded(values2[lo:hi], n2, c2)
        cn1 = np.zeros(p_tile, dtype=np.int32)
        cn2 = np.zeros(p_tile, dtype=np.int32)
        cn1[: hi - lo] = n1
        cn2[: hi - lo] = n2

        z = np.concatenate([v1, v2], axis=1)
        lab = np.zeros((p_tile, c1 + c2), dtype=np.float32)
        lab[:, :c1] = 1.0

        d_dev, trs_dev, ties_dev = kernels.pooled_rank_components(
            jnp.asarray(z), jnp.asarray(lab),
            jnp.asarray(np.maximum(cn1, 1).astype(np.float32)),
            jnp.asarray(np.maximum(cn2, 1).astype(np.float32)),
        )
        sl = slice(0, hi - lo)
        d_plain = np.asarray(d_dev)[sl].astype(np.float64)
        trs = np.asarray(trs_dev)[sl]
        ties = np.asarray(ties_dev)[sl]

        n1f = n1.astype(np.float64)
        n2f = n2.astype(np.float64)

        # Mann-Whitney U (ref myDetect.py:331-333)
        u_min, zstat = kernels.mwu_from_components(trs, ties, n1, n2)
        out["stu"][lo:hi] = special.clamp_stat(u_min)
        out["pu"][lo:hi] = special.clamp_p(special.mwu_pvalue(zstat))

        # Welch t (ref myDetect.py:335-337) — host, float64
        t, df, (m1, va1, m2, va2) = kernels.welch_host(
            values1[lo:hi], n1, values2[lo:hi], n2
        )
        out["stt"][lo:hi] = special.clamp_stat(t)
        out["pt"][lo:hi] = special.clamp_p(special.welch_pvalue(t, df))
        if want_mstd:
            mstd[lo:hi, 0] = m1
            mstd[lo:hi, 1] = np.sqrt(va1 * np.maximum(n1f - 1, 1) / np.maximum(n1f, 1))
            mstd[lo:hi, 2] = m2
            mstd[lo:hi, 3] = np.sqrt(va2 * np.maximum(n2f - 1, 1) / np.maximum(n2f, 1))

        # KS, with optional capped repeated-subsample variant
        # (ref myDetect.py:339-361)
        if cov > 0:
            need_cap = (n1 > cov) | (n2 > cov)
        else:
            need_cap = np.zeros(hi - lo, dtype=bool)
        if need_cap.any():
            q_idx = int(cfg.downsampling * cfg.downsampling_quantile)
            d_cap = np.asarray(
                kernels.capped_ks_d(
                    jnp.asarray(v1), jnp.asarray(cn1), jnp.asarray(v2), jnp.asarray(cn2),
                    cov=cov, repeats=cfg.downsampling, quantile_idx=q_idx,
                    seed=cfg.downsampling_seed + lo,
                )
            )[sl].astype(np.float64)
            ne1 = np.minimum(n1f, cov)
            ne2 = np.minimum(n2f, cov)
            d_sel = np.where(need_cap, d_cap, d_plain)
            p_ks = np.where(
                need_cap,
                special.ks_pvalue(d_cap, ne1, ne2),
                special.ks_pvalue(d_plain, n1f, n2f),
            )
        else:
            d_sel = d_plain
            p_ks = special.ks_pvalue(d_plain, n1f, n2f)
        out["stks"][lo:hi] = special.clamp_stat(d_sel)
        out["pks"][lo:hi] = special.clamp_p(p_ks)

    return TestResult(**out, mstd=mstd)
