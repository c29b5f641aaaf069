"""Typed configuration objects.

The reference threads a single mutable ``moptions`` dict through every
function and also uses it as a scratch blackboard (ref bin/NanoMod.py:40-97,
bin/scripts/myDetect.py:569-572).  Here every stage takes an immutable typed
config; runtime state lives in explicit data structures.

Defaults mirror the reference CLI defaults (ref bin/NanoMod.py:344-460).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


# Output levels (ref bin/scripts/myCom.py:5-8)
OUTPUT_DEBUG = 0
OUTPUT_INFO = 1
OUTPUT_WARNING = 2
OUTPUT_ERROR = 3


@dataclass(frozen=True)
class StatConfig:
    """Options controlling the per-position statistical test battery.

    Mirrors the knobs consumed by ``getKStest``/``combin_pvalues``/``mtest2``
    (ref bin/scripts/myDetect.py:327-520).
    """

    # ±k neighbor KS p-values feed the combination step
    # (ref NanoMod.py:357, myDetect.py:383).
    neighbor_pvalues: int = 2
    # geometric weight decay for weighted Stouffer (ref NanoMod.py:358,
    # myDetect.py:395-401).
    weights_dif: float = 2.0
    # 'fisher' | 'stouffer' | 'ks' (ref NanoMod.py:359).
    test_method: str = "stouffer"
    # per-strand coverage caps (+,-); 0 = no cap (ref NanoMod.py:392,174-176).
    coverages: Tuple[int, int] = (0, 0)
    # repeated-subsample count for the capped KS (ref NanoMod.py:390).
    downsampling: int = 100
    # which quantile of the repeated KS p-values to keep (ref NanoMod.py:389).
    downsampling_quantile: float = 0.25
    # RNG seed for the capped-KS subsampling (stateless jax.random; the
    # reference used the global numpy RNG, myDetect.py:351-354).
    downsampling_seed: int = 0

    def __post_init__(self):
        if self.test_method not in ("fisher", "stouffer", "ks"):
            raise ValueError(f"bad test_method {self.test_method!r}")
        if self.neighbor_pvalues < 0:
            raise ValueError("neighbor_pvalues must be >= 0")


@dataclass(frozen=True)
class RankConfig:
    """Ranking / top-N options (ref myDetect.py:257-299,416-520)."""

    # half-width; CLI --window is full width w, stored as (w-1)//2
    # (ref NanoMod.py:51).
    window: int = 10
    top_n: int = 30
    # 'pv' (p-value) or 'st' (statistic) (ref NanoMod.py:361).
    rank_use: str = "pv"
    # region-window ranking mode (ref NanoMod.py:363-366, myDetect.py:463-516)
    region_rank_by_st: bool = False
    percentile: float = 0.1
    wind_ovlp: bool = False
    # nucleotide filter for region mode: '' = all (ref NanoMod.py:366).
    na: str = ""


@dataclass(frozen=True)
class DetectConfig:
    """End-to-end two-group detection (ref NanoMod.py:112-178)."""

    wrk_base1: str = ""
    wrk_base2: str = ""
    out_folder: str = "mRes/"
    file_id: str = "mod"
    out_level: int = OUTPUT_WARNING

    min_coverage: int = 5  # ref NanoMod.py:354
    stats: StatConfig = field(default_factory=StatConfig)
    rank: RankConfig = field(default_factory=RankConfig)

    # region-of-interest filter "chr[:pos[:pos2]]" (ref NanoMod.py:117-129)
    chrom: Optional[str] = None
    pos: Optional[int] = None       # 0-based
    pos2: Optional[int] = None      # 0-based
    # read-length filters (ref NanoMod.py:387-388, myDetect.py:90-102)
    min_lr: int = 500
    min_lr_nb: int = 0
    # save per-position mean/std table (ref NanoMod.py:378)
    mstd: bool = False
    save_test: bool = True
    plot_type: str = "Density"  # 'Violin' | 'Density' (ref NanoMod.py:385)
    make_plots: bool = False

    # engine knobs (new — no reference counterpart)
    # >1 shards the test battery + neighbor combination over an n-device
    # ('data','pos') mesh (parallel/sharded.py); byte-identical output to
    # the single-device path.  0/1 = single device.
    n_devices: int = 0
    # positions per stats tile: large tiles amortize per-dispatch
    # round-trip latency (dominant on tunneled links at genome scale);
    # memory per tile is ~tile_positions * coverage * 4 bytes on device
    tile_positions: int = 16384
    # cap on the per-position signal reservoir (0 = exact/unbounded, like
    # the reference's Python lists); >0 keeps a deterministic random
    # subsample per deeper position, bounding pool memory at [P, cap] (new)
    pool_capacity: int = 0
    # multi-host pool merge strategy (only used when jax.process_count()>1):
    # 'union'   — every observation allgathered to every host; each host
    #             holds full pools and computes the full battery (simple,
    #             exact; DCN bytes and RAM scale with hosts x data)
    # 'sharded' — observations routed once to position-range owners via
    #             all-to-all; each host tests only its range and writes its
    #             output shard, rank 0 concatenates (parallel/shardmerge.py;
    #             byte-identical output, DCN bytes ~ data, RAM ~ data/hosts;
    #             region-rank mode and plots need 'union')
    merge_mode: str = "union"
    dtype: str = "float32"         # on-device compute dtype
    num_workers: int = 8           # host-side ingest threads
    native_ingest: bool = True     # C++ FAST5 parser (h5py fallback if absent)
    # write per-stage timing/throughput counters as JSON (new)
    metrics_file: Optional[str] = None
    # jax.profiler trace directory (new; also via NANOMOD_PROFILE_DIR)
    profile_dir: Optional[str] = None


@dataclass(frozen=True)
class AnnotateConfig:
    """Resquiggle/annotation phase (ref NanoMod.py:295-339)."""

    wrk_base1: str = ""
    ref_fasta: str = ""
    out_level: int = OUTPUT_WARNING
    kmer_model_file: Optional[str] = None
    # base-window/signal-window knobs (ref NanoMod.py:447-455)
    resegment_wind: int = 4
    resegment_signal_wind: int = 4
    min_num_signal: int = 4
    # extra raw-signal fraction required per indel group
    # (ref myRefBaseSignalAnnotation.py:33, moresignalperc)
    more_signal_perc: float = 0.3
    threads: int = 12
    files_per_thread: int = 300
    basecall_1d: str = "Basecall_1D_000"
    basecall_2strand: str = "BaseCalled_template"
    recursive: bool = True
    # alignment engine: 'dp' = built-in banded DP (default; replaces
    # bwa/minimap2 subprocess at ref myRefBaseSignalAnnotation.py:406-417)
    align: str = "dp"
    # banded-DP parameters (new)
    band_width: int = 128
    seed_k: int = 12
    match_score: int = 2
    mismatch_score: int = -3
    gap_open: int = -5
    gap_extend: int = -2
    # use the C++ correction core when the toolchain is available
    use_native: bool = True
    # use the Pallas DP kernel on accelerator backends (falls back to the
    # lax.scan implementation on CPU)
    use_pallas_dp: bool = True
    # reads per banded-DP dispatch.  Each dispatch pays a FIXED device cost
    # (the row scan + traceback walk are sequential in read length, and a
    # tunneled link adds ~50 ms of fetch round trip), so bigger batches
    # amortize it; sub-batching below the chunk size still lets the host
    # correction of batch k overlap the device DP of batch k+1 (new)
    dp_batch_size: int = 256
    # walk the DP traceback on device (lax.scan over all reads in lockstep)
    # so only per-step op codes cross the device->host link instead of the
    # [M, W] traceback matrix (new)
    use_device_walk: bool = True
    # skip FAST5s that already carry a NanomoCorrected_000 group — resume
    # after an interrupted run (new; the reference always rewrites,
    # ref myRefBaseSignalAnnotation.py:706-714)
    resume: bool = False
    # corrected-dataset storage: 'gzip' matches the reference's files
    # (ref myRefBaseSignalAnnotation.py:739-742; the deflate runs on worker
    # threads, outside the h5py lock); 'none' trades ~2x file size for the
    # fastest possible write-back
    fast5_compression: str = "gzip"
    # write per-stage timing/throughput counters as JSON (new)
    metrics_file: Optional[str] = None
    # >1 round-robins the banded-DP sub-batches (and their device
    # traceback walks) across that many local devices, with the in-flight
    # window widened so every chip has work — the TPU analog of the
    # reference's 12-process worker pool
    # (ref myRefBaseSignalAnnotation.py:1452-1483).  0/1 = single device.
    # Corrected FAST5 output is byte-identical for any value (the DP is
    # deterministic and the write order is the dispatch order).
    n_devices: int = 0


@dataclass(frozen=True)
class SimulateConfig:
    """Mixing-simulation harness (ref NanoMod.py:181-292)."""

    wrk_base1: str = ""   # control
    wrk_base2: str = ""   # case
    wrk_base3: Optional[str] = None   # second control (worker mode)
    out_folder: str = "mRes/"
    file_id: str = "mod"
    out_level: int = OUTPUT_WARNING

    percentages: Tuple[float, ...] = (0.3,)
    percentage: float = 0.3           # simulat2 single value
    case_size: Optional[int] = None   # simulat2/DownSampling
    run_type: int = 2
    random_times: int = 10            # ref mySimulate.py:331
    seed: int = 1                     # ref mySimulate.py:335 random.seed(1)
    # known modified site (ref mySimulate.py:26-28)
    target_chr: str = "spel"
    target_pos: int = 3072            # 0-based
    target_strand: str = "-"
    foldersep: int = 3                # ref mySimulate.py:30

    min_coverage: int = 5
    stats: StatConfig = field(default_factory=StatConfig)
    rank: RankConfig = field(default_factory=RankConfig)


def replace(cfg, **kw):
    """dataclasses.replace that tolerates nested field paths 'stats.x'."""
    direct = {k: v for k, v in kw.items() if "." not in k}
    nested = {k: v for k, v in kw.items() if "." in k}
    for k, v in nested.items():
        head, rest = k.split(".", 1)
        sub = getattr(cfg, head)
        direct[head] = replace(sub, **{rest: v})
    return dataclasses.replace(cfg, **direct)
