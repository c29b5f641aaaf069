"""Command-line interface.

Mirrors the reference CLI's five subcommands and argument names
(ref bin/NanoMod.py:344-460) so existing NanoMod invocations translate
directly:

    python -m nanomod_tpu.cli detect --wrkBase1 CTRL --wrkBase2 CASE ...
    python -m nanomod_tpu.cli simulate --wrkBase1 ... --Percentages 0.3,0.5
    python -m nanomod_tpu.cli simulat2 --Percentage 0.2 --CaseSize 2000
    python -m nanomod_tpu.cli DownSampling --CaseSize 100
    python -m nanomod_tpu.cli Annotate --wrkBase1 READS --Ref ref.fa
"""

from __future__ import annotations

import argparse
import sys

from nanomod_tpu.config import (OUTPUT_DEBUG, OUTPUT_ERROR, OUTPUT_INFO,
                                OUTPUT_WARNING, AnnotateConfig, DetectConfig,
                                RankConfig, SimulateConfig, StatConfig)


def _common(parser):
    g = parser.add_argument_group("Common options")
    g.add_argument("--outLevel", type=int, default=OUTPUT_WARNING,
                   choices=[OUTPUT_DEBUG, OUTPUT_INFO, OUTPUT_WARNING, OUTPUT_ERROR])
    g.add_argument("--wrkBase1", help="base folder of the first group")
    g.add_argument("--window", type=int, default=21,
                   help="full window width (stored as half-width)")
    g.add_argument("--FileID", default="mod")
    g.add_argument("--outFolder", default="mRes/")
    g.add_argument("--MinCoverage", type=int, default=5)
    g.add_argument("--topN", type=int, default=30)
    g.add_argument("--neighborPvalues", type=int, default=2)
    g.add_argument("--WeightsDif", type=float, default=2.0)
    g.add_argument("--testMethod", default="stouffer",
                   choices=["fisher", "stouffer", "ks"])
    g.add_argument("--rankUse", default="pv", choices=["st", "pv"])
    g.add_argument("--SaveTest", type=int, default=1, choices=[0, 1])
    g.add_argument("--RegionRankbyST", type=int, default=0, choices=[0, 1])
    g.add_argument("--percentile", type=float, default=0.1)
    g.add_argument("--WindOvlp", type=int, default=0, choices=[0, 1])
    g.add_argument("--NA", type=str, default="", choices=["", "A", "C", "G", "T"])


def _stat_cfg(a, coverages="0-0") -> StatConfig:
    cov = list(map(int, coverages.split("-")))
    if len(cov) == 1:
        cov = [cov[0], cov[0]]
    return StatConfig(
        neighbor_pvalues=a.neighborPvalues,
        weights_dif=max(a.WeightsDif, 1.0),
        test_method=a.testMethod,
        coverages=(cov[0], cov[1]),
        downsampling=getattr(a, "downsampling", 100),
        downsampling_quantile=getattr(a, "downsampling_quantile", 0.25),
    )


def _rank_cfg(a) -> RankConfig:
    return RankConfig(
        window=(a.window - 1) // 2,
        top_n=a.topN,
        rank_use=a.rankUse,
        region_rank_by_st=bool(a.RegionRankbyST),
        percentile=min(max(a.percentile, 0.0), 0.99),
        wind_ovlp=bool(a.WindOvlp),
        na=a.NA,
    )


def cmd_detect(a):
    from nanomod_tpu.detect import run_detect
    cfg = DetectConfig(
        wrk_base1=a.wrkBase1, wrk_base2=a.wrkBase2,
        out_folder=a.outFolder, file_id=a.FileID, out_level=a.outLevel,
        min_coverage=a.MinCoverage,
        stats=_stat_cfg(a, a.coverages), rank=_rank_cfg(a),
        min_lr=a.min_lr, min_lr_nb=a.min_lr_nb, mstd=bool(a.mstd),
        save_test=bool(a.SaveTest), plot_type=a.plotType, make_plots=True,
        metrics_file=a.metricsFile or None, profile_dir=a.profileDir or None,
        n_devices=a.n_devices, tile_positions=a.tile_positions,
        pool_capacity=a.pool_capacity, merge_mode=a.merge_mode,
    )
    if a.Pos:
        parts = a.Pos.split(":")
        kw = {"chrom": parts[0]}
        if len(parts) > 1:
            kw["pos"] = int(parts[1]) - 1
        if len(parts) > 2:
            kw["pos2"] = int(parts[2]) - 1
        from nanomod_tpu.config import replace
        cfg = replace(cfg, **kw)
    table, order, sites = run_detect(cfg)
    for s in sites[: cfg.rank.top_n]:
        print(f"Rank {s.rank}: {s.chrom} {s.strand} {s.pos + 1} {s.base}")


def _sim_cfg(a, percentages=(0.3,), percentage=0.3) -> SimulateConfig:
    return SimulateConfig(
        wrk_base1=a.wrkBase1, wrk_base2=a.wrkBase2,
        wrk_base3=getattr(a, "wrkBase3", None),
        out_folder=a.outFolder, file_id=a.FileID, out_level=a.outLevel,
        percentages=tuple(percentages), percentage=percentage,
        case_size=getattr(a, "CaseSize", None),
        run_type=getattr(a, "runType", 2),
        foldersep=getattr(a, "foldersep", 3),
        min_coverage=a.MinCoverage,
        stats=_stat_cfg(a), rank=_rank_cfg(a),
    )


def cmd_simulate(a):
    from nanomod_tpu.harness.simulate import (group_ranks,
                                              merge_grid_outputs,
                                              run_simulate,
                                              run_simulate_grid)
    from nanomod_tpu.harness.plots import plot_rank_histogram
    percs = sorted(float(x) for x in a.Percentages.split(","))
    cfg = _sim_cfg(a, percentages=percs)
    if a.wrkBase3 is None:
        # cluster/grid mode (ref mySimulate.py:344-467): subfolder-pair
        # grid sharded across hosts instead of qsub fan-out
        fids, _ = run_simulate_grid(cfg)
        grouped, labels = merge_grid_outputs(cfg, fids)
    else:
        results = run_simulate(cfg)
        grouped, labels = group_ranks(results)
    import os
    plot_rank_histogram(grouped, labels,
                        os.path.join(cfg.out_folder, f"hist_{cfg.file_id}.png"))


def cmd_simulat2(a):
    from nanomod_tpu.harness.simulate import (run_simulat2,
                                              run_simulat2_sweep,
                                              summarize_outputs)
    cfg = _sim_cfg(a, percentage=a.Percentage or 0.2)
    if a.runType == 2:
        run_simulat2(cfg)
    elif a.runType == 1:
        run_simulat2_sweep(cfg)
    else:
        import glob
        import os
        fids = [os.path.basename(p)[:-7] for p in
                glob.glob(os.path.join(cfg.out_folder, "*.output"))]
        grouped, labels = summarize_outputs(cfg.out_folder, fids)
        from nanomod_tpu.harness.plots import plot_rank_histogram
        plot_rank_histogram(grouped, labels,
                            os.path.join(cfg.out_folder,
                                         f"hist_{cfg.file_id}.png"),
                            xlabel="CaseSize")


def cmd_downsampling(a):
    from nanomod_tpu.harness.simulate import (run_downsampling,
                                              run_downsampling_sweep,
                                              summarize_outputs)
    cfg = _sim_cfg(a)
    if a.runType == 2:
        run_downsampling(cfg)
    elif a.runType == 1:
        run_downsampling_sweep(cfg)
    else:
        import glob
        import os
        pref = a.mprefix or cfg.file_id
        fids = [os.path.basename(p)[:-7] for p in
                glob.glob(os.path.join(cfg.out_folder, f"{pref}*.output"))]
        grouped, labels = summarize_outputs(cfg.out_folder, fids)
        from nanomod_tpu.harness.plots import plot_rank_histogram
        plot_rank_histogram(grouped, labels,
                            os.path.join(cfg.out_folder,
                                         f"hist_{cfg.file_id}.png"),
                            xlabel="CaseSize")


def cmd_annotate(a):
    from nanomod_tpu.resquiggle import annotate_folder
    cfg = AnnotateConfig(
        wrk_base1=a.wrkBase1, ref_fasta=a.Ref, out_level=a.outLevel,
        kmer_model_file=a.kmer_model_file,
        resegment_wind=a.Resegment_wind,
        resegment_signal_wind=a.Resegment_signal_wind,
        min_num_signal=a.MinNumSignal,
        threads=a.threads, files_per_thread=a.files_per_thread,
        basecall_1d=a.basecall_1d, basecall_2strand=a.basecall_2strand,
        recursive=bool(a.recursive), resume=bool(a.resume),
        align=a.alignStr,
        metrics_file=a.metricsFile or None,
        n_devices=a.n_devices,
    )
    annotate_folder(cfg)


def build_parser():
    parser = argparse.ArgumentParser(
        prog="nanomod_tpu",
        description="TPU-native nanopore modification detection",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("detect", help="detect modifications between two groups")
    _common(p)
    p.add_argument("--wrkBase2")
    p.add_argument("--Pos", default="")
    p.add_argument("--mstd", type=int, default=0)
    p.add_argument("--plotType", default="Density", choices=["Violin", "Density"])
    p.add_argument("--min_lr", type=int, default=500)
    p.add_argument("--min_lr_nb", type=int, default=0)
    p.add_argument("--downsampling_quantile", type=float, default=0.25)
    p.add_argument("--downsampling", type=int, default=100)
    p.add_argument("--coverages", type=str, default="0-0")
    p.add_argument("--metricsFile", default="",
                   help="write per-stage timing/throughput JSON here")
    p.add_argument("--profileDir", default="",
                   help="jax.profiler trace dir (XProf/TensorBoard)")
    p.add_argument("--n_devices", type=int, default=0,
                   help="shard the test battery + combination over an "
                        "n-device mesh (0 = single device); output is "
                        "byte-identical to the single-device run")
    p.add_argument("--tile_positions", type=int, default=16384,
                   help="positions per device stats tile")
    p.add_argument("--pool_capacity", type=int, default=0,
                   help="cap per-position signal reservoirs (deterministic "
                        "subsample beyond the cap; 0 = keep everything). "
                        "Bounds pool memory at genome scale")
    p.add_argument("--merge_mode", choices=("union", "sharded"),
                   default="union",
                   help="multi-host pool merge: 'union' allgathers all "
                        "observations to every host; 'sharded' routes each "
                        "observation once to its position-range owner "
                        "(byte-identical output, DCN/RAM scale per host)")
    p.set_defaults(func=cmd_detect)

    p = sub.add_parser("simulate", help="percentage-mixing simulation")
    _common(p)
    p.add_argument("--wrkBase2")
    p.add_argument("--wrkBase3",
                   help="second control folder (worker mode); omit to run "
                        "the subfolder-pair grid over wrkBase1/wrkBase2")
    p.add_argument("--Percentages", type=str, default="0.3")
    p.add_argument("--foldersep", type=int, default=3,
                   help="control-test subfolder offset in grid mode "
                        "(mk = (mi + foldersep) %% n_control_subfolders)")
    p.set_defaults(func=cmd_simulate)

    p = sub.add_parser("simulat2", help="case-size scaling simulation")
    _common(p)
    p.add_argument("--wrkBase2")
    p.add_argument("--Percentage", type=float, default=None)
    p.add_argument("--CaseSize", type=int, default=None)
    p.add_argument("--runType", type=int, default=2, choices=[1, 2, 3])
    p.set_defaults(func=cmd_simulat2)

    p = sub.add_parser("DownSampling", help="coverage-scaling simulation")
    _common(p)
    p.add_argument("--wrkBase2")
    p.add_argument("--CaseSize", type=int, default=None)
    p.add_argument("--runType", type=int, default=2, choices=[1, 2, 3])
    p.add_argument("--mprefix", type=str, default="")
    p.set_defaults(func=cmd_downsampling)

    p = sub.add_parser("Annotate", help="resquiggle reads against a reference")
    p.add_argument("--outLevel", type=int, default=OUTPUT_WARNING)
    p.add_argument("--wrkBase1")
    p.add_argument("--Ref")
    p.add_argument("--kmer_model_file", default=None)
    p.add_argument("--Resegment_wind", type=int, default=4)
    p.add_argument("--Resegment_signal_wind", type=int, default=4)
    p.add_argument("--MinNumSignal", type=int, default=4)
    p.add_argument("--threads", type=int, default=12)
    p.add_argument("--files_per_thread", type=int, default=300)
    p.add_argument("--basecall_1d", default="Basecall_1D_000")
    p.add_argument("--basecall_2strand", default="BaseCalled_template")
    p.add_argument("--recursive", type=int, default=1, choices=[0, 1])
    p.add_argument("--alignStr", type=str, default="dp",
                   choices=["dp", "bwa", "minimap2"])
    p.add_argument("--resume", type=int, default=0, choices=[0, 1],
                   help="skip FAST5s already carrying NanomoCorrected_000")
    p.add_argument("--metricsFile", default="",
                   help="write per-stage timing/throughput JSON here")
    p.add_argument("--n_devices", type=int, default=0,
                   help="round-robin banded-DP sub-batches over n local "
                        "devices (0/1 = single device); corrected output "
                        "is byte-identical for any value")
    p.set_defaults(func=cmd_annotate)
    return parser


def main(argv=None):
    # persistent jit cache: repeated invocations (and the simulate grids)
    # skip the 20-40s first-compile cost per kernel shape
    import os
    if not os.environ.get("NANOMOD_NO_JAX_CACHE"):
        import jax
        cache = os.environ.get(
            "NANOMOD_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "nanomod_tpu_jax"))
        jax.config.update("jax_compilation_cache_dir", cache)
    parser = build_parser()
    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
