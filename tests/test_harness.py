"""Simulation harness tests: mixing trials must rank the planted site
highly at high mix percentages and poorly at zero signal."""

import os

import numpy as np
import pytest

from fixtures import make_genome, make_corrected_dataset
from nanomod_tpu.config import SimulateConfig, RankConfig, replace
from nanomod_tpu.harness.simulate import (group_ranks, load_group_reads,
                                          rank_bins, run_downsampling,
                                          run_simulat2, run_simulate)

MOD_POS = 120


@pytest.fixture(scope="module")
def sim_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sim"))
    chrom, genome = make_genome(length=260, seed=21)
    case = os.path.join(root, "case")
    ctrl = os.path.join(root, "ctrl")
    make_corrected_dataset(case, chrom, genome, n_reads=40, seed=31,
                           mod_pos=MOD_POS, mod_delta=1.4, strands="-")
    make_corrected_dataset(ctrl, chrom, genome, n_reads=80, seed=32,
                           strands="-")
    case_reads = load_group_reads(case)
    ctrl_reads = load_group_reads(ctrl)
    return root, chrom, case, ctrl, case_reads, ctrl_reads


def _cfg(root, chrom, case, ctrl, **kw):
    cfg = SimulateConfig(
        wrk_base1=ctrl, wrk_base2=case,
        out_folder=os.path.join(root, "out"),
        target_chr=chrom, target_pos=MOD_POS, target_strand="-",
        random_times=3, rank=RankConfig(window=2),
    )
    return replace(cfg, **kw) if kw else cfg


def test_simulate_high_percentage_ranks_first(sim_data):
    root, chrom, case, ctrl, case_reads, ctrl_reads = sim_data
    n = len(ctrl_reads)
    mix = dict(list(ctrl_reads.items())[: n // 2])
    test_grp = dict(list(ctrl_reads.items())[n // 2:])
    cfg = _cfg(root, chrom, case, ctrl, percentages=(0.9,))
    res = run_simulate(cfg, case_reads=case_reads, control_mix=mix,
                       control_test=test_grp)
    assert all(r == 1 for r in res[0.9]), res
    # .output + .done files written
    assert os.path.exists(os.path.join(root, "out", "mod.output"))
    assert os.path.exists(os.path.join(root, "out", "mod.done"))


def test_simulate_zero_signal_rarely_ranks(sim_data):
    root, chrom, case, ctrl, case_reads, ctrl_reads = sim_data
    n = len(ctrl_reads)
    mix = dict(list(ctrl_reads.items())[: n // 2])
    test_grp = dict(list(ctrl_reads.items())[n // 2:])
    # control vs control: target should not be rank 1 consistently
    cfg = _cfg(root, chrom, case, ctrl, percentages=(0.9,), file_id="null")
    res = run_simulate(cfg, case_reads=mix, control_mix=mix,
                       control_test=test_grp)
    assert not all(r == 1 for r in res[0.9])


def test_simulat2_exact_sampling(sim_data):
    root, chrom, case, ctrl, case_reads, ctrl_reads = sim_data
    cfg = _cfg(root, chrom, case, ctrl, percentage=0.5, case_size=20,
               random_times=3, file_id="s2")
    ranks = run_simulat2(cfg, case_reads=case_reads, control_reads=ctrl_reads)
    assert len(ranks) == 3
    assert all(r == 1 for r in ranks), ranks


def test_downsampling_coverage_check(sim_data):
    root, chrom, case, ctrl, case_reads, ctrl_reads = sim_data
    cfg = _cfg(root, chrom, case, ctrl, case_size=60, random_times=2,
               file_id="ds")
    ranks = run_downsampling(cfg, case_reads=case_reads,
                             control_reads=ctrl_reads)
    # case vs control directly: planted site must dominate
    assert len(ranks) == 2 and all(r == 1 for r in ranks), ranks


def test_rank_bins_cover_all_ranks():
    bins, split_points, labels = rank_bins(2061)
    assert bins[1] == labels[0]
    assert bins[split_points[-1]] == labels[-2]
    grouped, labs = group_ranks({0.3: [1, 1, 2, 50, -1]}, seqsize=2061)
    assert abs(sum(grouped[0.3].values()) - 1.0) < 1e-9


def test_plots_render(sim_data, tmp_path):
    root, chrom, case, ctrl, case_reads, ctrl_reads = sim_data
    from nanomod_tpu.harness.plots import plot_rank_histogram
    grouped, labels = group_ranks({0.3: [1, 2, 3], 0.5: [1, 1, 1]})
    p = plot_rank_histogram(grouped, labels, str(tmp_path / "hist.png"))
    assert os.path.getsize(p) > 1000
