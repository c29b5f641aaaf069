"""Simulation / evaluation harness.

Rebuilds the reference's three benchmarking subcommands
(ref bin/scripts/mySimulate.py, mySimulat2.py, myDownSampling0.py): mix
case/control reads, rerun detection, and record the rank of a known
modified site.  Where the reference fans the experiment grid out over an
SGE cluster with qsub/qstat polling (mySimulate.py:344-457), the rebuilt
detection core is fast enough to sweep the grid in-process; grids can also
be dispatched across hosts with jax.distributed (parallel/).

Rank semantics follow getTopRank (ref mySimulate.py:287-328): sites are
walked in significance order with min-distance dedup and a completeness
check over the ±window neighborhood; the recorded value is the output rank
of the first site within `closesize` of the target (or -1).
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from nanomod_tpu.accum.pools import PoolBuilder
from nanomod_tpu.config import DetectConfig, SimulateConfig, replace
from nanomod_tpu.detect import detect_from_pools
from nanomod_tpu.io.fast5 import iter_fast5_files, read_corrected_events
from nanomod_tpu.rank.ranking import top_sites


def load_group_reads(folder: str, recursive: bool = True):
    """Load all corrected reads of a folder (mySimulate.readEvents,
    ref mySimulate.py:101-122).  Returns {filename: CorrectedRead}."""
    out = {}
    for p in iter_fast5_files(folder, recursive=recursive):
        rd = read_corrected_events(p)
        if rd is not None:
            out[os.path.basename(p)] = rd
    return out


def _pools_from_reads(read_sets: Sequence[Dict]) -> Dict:
    """Accumulate one group's pools from several read dicts
    (getGenomeEvents, ref mySimulate.py:124-139)."""
    builder = PoolBuilder()
    for reads in read_sets:
        for rd in reads.values():
            builder.add_read(rd.chrom, rd.strand, rd.start, rd.norm_mean, rd.base)
    return builder.finalize()


def _close_size(cfg: SimulateConfig) -> int:
    closesize = cfg.stats.neighbor_pvalues * 2
    if cfg.rank.region_rank_by_st:
        closesize = max(cfg.rank.window, 1)
    return closesize


def rank_of_target(table, order, cfg: SimulateConfig) -> int:
    """getTopRank (ref mySimulate.py:287-328): output rank of the first
    dedup'd, window-complete site within closesize of the target, or -1."""
    closesize = _close_size(cfg)
    sites = top_sites(
        table, order, cfg.stats, cfg.rank, top_n=None,
        require_complete_window=True,
        stop_at=(cfg.target_chr, cfg.target_strand, cfg.target_pos, closesize),
    )
    if sites and sites[-1].chrom == cfg.target_chr \
            and sites[-1].strand == cfg.target_strand \
            and abs(sites[-1].pos - cfg.target_pos) < closesize:
        return sites[-1].rank
    return -1


def _detect_cfg(cfg: SimulateConfig) -> DetectConfig:
    return DetectConfig(min_coverage=cfg.min_coverage, stats=cfg.stats,
                        rank=cfg.rank, out_level=cfg.out_level,
                        save_test=False)


def mix_and_rank(case_reads: Dict, control_mix: Dict, control_test: Dict,
                 percentage: float, cfg: SimulateConfig,
                 rng: random.Random) -> int:
    """One Bernoulli mixing trial (mSimulate1 inner loop,
    ref mySimulate.py:209-251): group1 = case@p + control_mix@(1-p),
    group2 = control_test."""
    mcase = {k: v for k, v in case_reads.items() if rng.uniform(0, 1) <= percentage}
    mcon = {k: v for k, v in control_mix.items() if rng.uniform(0, 1) < 1 - percentage}
    pools1 = _pools_from_reads([mcase, mcon])
    pools2 = _pools_from_reads([control_test])
    table, order = detect_from_pools(pools1, pools2, _detect_cfg(cfg))
    return rank_of_target(table, order, cfg)


def run_simulate(cfg: SimulateConfig,
                 case_reads: Optional[Dict] = None,
                 control_mix: Optional[Dict] = None,
                 control_test: Optional[Dict] = None) -> Dict[float, List[int]]:
    """Percentage-sweep simulation (worker mode, mSimulate1,
    ref mySimulate.py:164-261).  Seeded like the reference
    (random.seed, ref :335)."""
    rng = random.Random(cfg.seed)
    case_reads = case_reads if case_reads is not None else load_group_reads(cfg.wrk_base2)
    control_mix = control_mix if control_mix is not None else load_group_reads(cfg.wrk_base1)
    control_test = control_test if control_test is not None else load_group_reads(
        cfg.wrk_base3 or cfg.wrk_base1)

    results: Dict[float, List[int]] = {}
    for perc in sorted(cfg.percentages):
        results[perc] = []
        for rt in range(cfg.random_times):
            r = mix_and_rank(case_reads, control_mix, control_test, perc, cfg, rng)
            results[perc].append(r)
            if cfg.out_level <= 1:
                print(f"Rank {perc} {rt} {r}")
    _save_output(results, cfg, fmt_key="%.5f")
    return results


def run_simulat2(cfg: SimulateConfig,
                 case_reads: Optional[Dict] = None,
                 control_reads: Optional[Dict] = None) -> List[int]:
    """Fixed-percentage, exact-case-size simulation (runType 2,
    ref mySimulat2.py:101-181): sample CaseSize case reads and
    CaseSize*(1-p)/p + CaseSize/p control reads without replacement."""
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    case_reads = case_reads if case_reads is not None else load_group_reads(cfg.wrk_base2)
    control_reads = control_reads if control_reads is not None else load_group_reads(cfg.wrk_base1)
    casekeys = list(case_reads)
    contkeys = list(control_reads)

    n_case = cfg.case_size
    n_con1 = int(n_case * (1 - cfg.percentage) / cfg.percentage)
    n_con2 = int(n_case / cfg.percentage)

    ranks = []
    for rt in range(cfg.random_times):
        ci = np.random.choice(len(casekeys), min(n_case, len(casekeys)),
                              replace=False)
        mcase = {casekeys[x]: case_reads[casekeys[x]] for x in ci}
        need = min(n_con1 + n_con2, len(contkeys))
        oi = np.random.choice(len(contkeys), need, replace=False)
        mcon1 = {contkeys[x]: control_reads[contkeys[x]] for x in oi[:n_con1]}
        mcon2 = {contkeys[x]: control_reads[contkeys[x]] for x in oi[n_con1:]}
        pools1 = _pools_from_reads([mcase, mcon1])
        pools2 = _pools_from_reads([mcon2])
        table, order = detect_from_pools(pools1, pools2, _detect_cfg(cfg))
        ranks.append(rank_of_target(table, order, cfg))
        if cfg.out_level <= 1:
            print(f"Rank {cfg.percentage} {rt} {ranks[-1]}")
    _save_output({cfg.case_size: ranks}, cfg, fmt_key="%d")
    return ranks


def run_downsampling(cfg: SimulateConfig,
                     case_reads: Optional[Dict] = None,
                     control_reads: Optional[Dict] = None) -> List[int]:
    """Coverage-scaling simulation (myDownSampling0.mSimulate1,
    ref myDownSampling0.py:38-132): equal-size case/control samples with a
    coverage-at-target acceptance check (>= 0.95*CaseSize/5 at target±3)
    and adaptive 2% oversampling on repeated failures."""
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    case_reads = case_reads if case_reads is not None else load_group_reads(cfg.wrk_base1)
    control_reads = control_reads if control_reads is not None else load_group_reads(cfg.wrk_base2)
    casekeys = list(case_reads)
    contkeys = list(control_reads)

    ranks = []
    rt = repeat_time = cur_repeat_time = 0
    attempts = 0
    while rt < cfg.random_times and attempts < cfg.random_times * 30:
        attempts += 1
        more = min(repeat_time, 15)
        n = int(cfg.case_size * (1 + more * 0.02))
        if len(casekeys) > n:
            ci = np.random.choice(len(casekeys), n, replace=False)
            mcase = {casekeys[x]: case_reads[casekeys[x]] for x in ci}
        else:
            mcase = case_reads
        if len(contkeys) > n:
            oi = np.random.choice(len(contkeys), n, replace=False)
            mcon = {contkeys[x]: control_reads[contkeys[x]] for x in oi}
        else:
            mcon = control_reads
        pools1 = _pools_from_reads([mcase])
        pools2 = _pools_from_reads([mcon])

        # coverage-at-target acceptance (ref :94-113)
        lacking = 0
        need = 0.95 * cfg.case_size / 5
        key = (cfg.target_chr, cfg.target_strand)
        for pools in (pools1, pools2):
            pp = pools.get(key)
            for pos in range(cfg.target_pos - 3, cfg.target_pos + 4):
                if pp is None:
                    lacking += 1
                    continue
                idx = np.searchsorted(pp.positions, pos)
                cnt = int(pp.counts[idx]) if (idx < len(pp.positions)
                                              and pp.positions[idx] == pos) else 0
                if cnt < need:
                    lacking += 1
        if lacking > 2:
            if lacking > 3 and cur_repeat_time > 5:
                repeat_time += 1
            cur_repeat_time += 1
            continue

        table, order = detect_from_pools(pools1, pools2, _detect_cfg(cfg))
        ranks.append(rank_of_target(table, order, cfg))
        rt += 1
        cur_repeat_time = 0
    _save_output({cfg.case_size: ranks}, cfg, fmt_key="%d")
    return ranks


def _save_output(results: Dict, cfg: SimulateConfig, fmt_key: str):
    """.output rank files + .done sentinel (ref mySimulate.py:258-277)."""
    os.makedirs(cfg.out_folder, exist_ok=True)
    base = os.path.join(cfg.out_folder, cfg.file_id)
    with open(base + ".output", "w") as f:
        for k in sorted(results):
            f.write(fmt_key % k)
            for r in results[k]:
                if int(r) < 0:
                    continue
                f.write(" %d" % r)
            f.write("\n")
    open(base + ".done", "w").close()


def get_subfolders(base: str) -> Tuple[List[str], int]:
    """Numbered-subfolder discovery (getSubFolders, ref mySimulate.py:74-99):
    returns (names, max_int+...)  — the grid iterates range(max_int) like
    the reference (note: the reference uses the MAXIMUM folder number as the
    exclusive bound, so a missing intermediate number yields an empty
    worker, exactly as its qsub fan-out did)."""
    subs = []
    mx = -1
    for name in sorted(os.listdir(base)):
        if not os.path.isdir(os.path.join(base, name)):
            continue
        try:
            v = int(name)
        except ValueError:
            continue
        subs.append(name)
        mx = max(mx, v)
    if mx == -1:
        raise FileNotFoundError(f"no numbered subfolders under {base} "
                                "(cluster/grid mode needs 0/ 1/ 2/ ...)")
    return subs, mx


def grid_file_id(cfg: SimulateConfig, mi: int, mj: int, mk: int,
                 perc: float) -> str:
    """Per-grid-point FileID, matching the reference's qsub job naming
    (ref mySimulate.py:350: '%s_%d_%d_%d_%.5f')."""
    return "%s_%d_%d_%d_%.5f" % (cfg.file_id, mi, mj, mk, perc)


def run_simulate_grid(cfg: SimulateConfig,
                      process_id: Optional[int] = None,
                      process_count: Optional[int] = None):
    """Cluster-mode percentage simulation (ref mySimulate.py:344-467): the
    (control-subfolder mi × case-subfolder mj) grid with control-test
    subfolder mk = (mi + foldersep) % max_control, one worker per
    (mi, mj, percentage).

    The reference fans this out as qsub jobs and polls qstat; here the
    grid points are sharded round-robin across hosts
    (parallel.dist.shard_list — jax.process_index by default, or the
    explicit process_id/process_count for external launchers) and each
    host sweeps its shard in-process.  Workers write the same per-point
    `.output`/`.done` files, so the merge (merge_grid_outputs) is the
    reference's file-level concatenation (ref :454-464).

    Returns (all_file_ids, local_results) — every host returns the full
    file-id list for merging; local_results holds only this host's shard.
    """
    from nanomod_tpu.parallel.dist import shard_list

    _, max0 = get_subfolders(cfg.wrk_base1)
    _, max1 = get_subfolders(cfg.wrk_base2)
    grid = []
    for mj in range(max1):
        for mi in range(max0):
            mk = (mi + cfg.foldersep) % max0
            grid.append((mi, mj, mk))

    all_fids = [grid_file_id(cfg, mi, mj, mk, perc)
                for (mi, mj, mk) in grid for perc in sorted(cfg.percentages)]

    local = shard_list(grid, process_id, process_count)
    local_results = {}
    for (mi, mj, mk) in local:
        sub_common = replace(
            cfg,
            wrk_base1=os.path.join(cfg.wrk_base1, str(mi)),
            wrk_base2=os.path.join(cfg.wrk_base2, str(mj)),
            wrk_base3=os.path.join(cfg.wrk_base1, str(mk)),
        )
        case_reads = load_group_reads(sub_common.wrk_base2)
        control_mix = load_group_reads(sub_common.wrk_base1)
        control_test = load_group_reads(sub_common.wrk_base3)
        for perc in sorted(cfg.percentages):
            sub = replace(sub_common, percentages=(perc,),
                          file_id=grid_file_id(cfg, mi, mj, mk, perc))
            res = run_simulate(sub, case_reads=case_reads,
                               control_mix=control_mix,
                               control_test=control_test)
            local_results[sub.file_id] = res
    return all_fids, local_results


def merge_grid_outputs(cfg: SimulateConfig, file_ids: List[str],
                       seqsize: int = 6184 // 3):
    """Merge per-grid-point `.output` files by percentage and bin the ranks
    (the reference's post-qsub merge + group_rank, ref mySimulate.py:454-517).
    Grid points whose `.done` sentinel is missing are skipped with a count,
    like the reference's 3-strikes tolerance."""
    done = [fid for fid in file_ids
            if os.path.isfile(os.path.join(cfg.out_folder, fid + ".done"))]
    missing = len(file_ids) - len(done)
    if missing and cfg.out_level <= 2:
        print(f"Warning: {missing}/{len(file_ids)} grid outputs missing")
    return summarize_outputs(cfg.out_folder, done, seqsize=seqsize)


def run_simulat2_sweep(cfg: SimulateConfig, case_sizes=None,
                       start: int = 1000, step: int = 1000,
                       process_id: Optional[int] = None,
                       process_count: Optional[int] = None):
    """runType 1 (ref mySimulat2.py:223-256): sweep CaseSize from `start`
    by `step` up to the maximum supportable by the control pool at the
    given percentage.  The reference submits one qsub job per size; here
    the sizes are sharded round-robin across hosts
    (parallel.dist.shard_list) and each host sweeps its shard in-process;
    runType 3 (summarize_outputs) merges the per-size `.output` files
    exactly like the reference's post-qsub loop."""
    from nanomod_tpu.parallel.dist import shard_list

    case_reads = load_group_reads(cfg.wrk_base2)
    control_reads = load_group_reads(cfg.wrk_base1)
    if case_sizes is None:
        total_control = len(control_reads)
        max_case = int(total_control * cfg.percentage / (2 - cfg.percentage))
        case_sizes = list(range(start, max(max_case, start + 1), step))
    results = {}
    for cs in shard_list(list(case_sizes), process_id, process_count):
        sub = replace(cfg, case_size=int(cs),
                      file_id=f"{cfg.file_id}_{cs}")
        results[int(cs)] = run_simulat2(sub, case_reads=case_reads,
                                        control_reads=control_reads)
    _save_output(results, replace(cfg, file_id=cfg.file_id + "_all"),
                 fmt_key="%d")
    return results


def run_downsampling_sweep(cfg: SimulateConfig, case_sizes=None,
                           process_id: Optional[int] = None,
                           process_count: Optional[int] = None):
    """DownSampling runType 1 (ref myDownSampling0.py:180-188): the fixed
    CaseSize ladder {60, 80, 100, 200, 400, 1000, 2000, 3000}, sharded
    round-robin across hosts like run_simulat2_sweep."""
    from nanomod_tpu.parallel.dist import shard_list

    case_sizes = case_sizes or [60, 80, 100, 200, 400, 1000, 2000, 3000]
    case_reads = load_group_reads(cfg.wrk_base1)
    control_reads = load_group_reads(cfg.wrk_base2)
    results = {}
    for cs in shard_list(list(case_sizes), process_id, process_count):
        sub = replace(cfg, case_size=int(cs), file_id=f"{cfg.file_id}_{cs}")
        results[int(cs)] = run_downsampling(sub, case_reads=case_reads,
                                            control_reads=control_reads)
    _save_output(results, replace(cfg, file_id=cfg.file_id + "_all"),
                 fmt_key="%d")
    return results


def summarize_outputs(out_folder: str, file_ids, seqsize: int = 6184 // 3):
    """runType 3: merge .output files and bin ranks (the reference's merge
    loop + mplotall, ref mySimulat2.py:282-311,430-586)."""
    merged = {}
    for fid in file_ids:
        path = os.path.join(out_folder, f"{fid}.output")
        if not os.path.isfile(path):
            continue
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                key = float(parts[0])
                merged.setdefault(key, []).extend(int(x) for x in parts[1:])
    return group_ranks(merged, seqsize=seqsize)


# ---------------------------------------------------------------------------
# Rank percentile binning (myBinDefault, ref mySimulate.py:32-55)
# ---------------------------------------------------------------------------

def rank_bins(seqsize: int = 6184 // 3):
    """(bins {rank -> label}, split_points, labels): percentile bins at
    0.1/0.25/0.5/1/2/3/4/5% of seqsize."""
    percentiles = [0.001, 0.0025, 0.005, 0.01, 0.02, 0.03, 0.04, 0.05]
    labels = ["(, %.2f%%]" % (percentiles[0] * 100)]
    bins = {}
    split_points = [int(p * seqsize) for p in percentiles]
    for rp in range(1, split_points[0] + 1):
        bins[rp] = labels[0]
    for i in range(len(split_points)):
        if i == len(split_points) - 1:
            lab = "(%.2f%%, )" % (percentiles[i] * 100)
            labels.append(lab)
            bins[split_points[i] + 1] = lab
        else:
            lab = "(%.2f%%, %.2f%%]" % (percentiles[i] * 100,
                                        percentiles[i + 1] * 100)
            labels.append(lab)
            for j in range(split_points[i] + 1, split_points[i + 1] + 1):
                bins[j] = lab
    return bins, split_points, labels


def group_ranks(results: Dict[float, List[int]], seqsize: int = 6184 // 3):
    """Fraction of trials per percentile bin, per sweep key
    (group_rank, ref mySimulate.py:478-517)."""
    bins, split_points, labels = rank_bins(seqsize)
    out = {}
    for k, ranks in results.items():
        counts = {lab: 0 for lab in labels}
        total = 0
        for r in ranks:
            r = int(r)
            if r <= 0:
                continue
            lab = bins.get(r, labels[-1]) if r <= split_points[-1] else labels[-1]
            counts[lab] += 1
            total += 1
        if total:
            out[k] = {lab: c / total for lab, c in counts.items()}
    return out, labels
