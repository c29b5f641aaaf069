#!/usr/bin/env python
"""Secondary benchmark: reads resquiggled per second (full Annotate path).

Generates a synthetic raw FAST5 dataset (2 kb reads, 3% basecall errors),
then measures the complete Annotate pipeline — HDF5 ingest, event
extraction, normalization, seeding, banded-DP alignment, native indel
correction, FAST5 write-back.

Prints one JSON line {"metric": "reads_resquiggled_per_sec", ...}.
vs_baseline uses the reference's practical per-core throughput: its hot
path is ~50+ ms of interpreted Python per 2 kb read plus bwa/samtools
subprocess overhead; we measure our own pure-Python fallback core (which
mirrors the reference algorithms) on the same reads as the stand-in.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    import numpy as np
    from fixtures import make_genome, make_raw_dataset
    from nanomod_tpu.config import AnnotateConfig, replace
    from nanomod_tpu.resquiggle import annotate_files
    from nanomod_tpu.io.fasta import FastaIndex
    from nanomod_tpu.resquiggle.seed import SeedIndex

    n_reads = int(os.environ.get("BENCH_READS", 512))
    read_len = int(os.environ.get("BENCH_READ_LEN", 2000))

    root = tempfile.mkdtemp()
    chrom, genome = make_genome(length=read_len + 500, seed=1)
    fasta_p = os.path.join(root, "ref.fa")
    with open(fasta_p, "w") as f:
        f.write(f">{chrom}\n{genome}\n")
    reads_dir = os.path.join(root, "reads")
    make_raw_dataset(reads_dir, chrom, genome, n_reads=n_reads, seed=2,
                     read_len=read_len, error_rate=0.03)
    paths = sorted(os.path.join(reads_dir, f) for f in os.listdir(reads_dir))

    cfg = AnnotateConfig(wrk_base1=reads_dir, ref_fasta=fasta_p)
    fasta = FastaIndex(fasta_p)
    sidx = SeedIndex(fasta.seqs, k=cfg.seed_k)

    # warmup (compiles; full batch so the measured run reuses the same
    # jit shapes — the DP is bucketed by batch size and read length);
    # median of 3 — single runs swing 2x with tunnel stalls
    import numpy as _np
    annotate_files(paths, cfg, fasta, sidx)
    rates = []
    for _ in range(int(os.environ.get("BENCH_ANNOTATE_REPEAT", 3))):
        t0 = time.time()
        n_ok, errors, _ = annotate_files(paths, cfg, fasta, sidx)
        rates.append(n_ok / (time.time() - t0))
    ours = float(_np.median(rates))

    # baseline stand-in: python correction core on a sample (the aligner and
    # IO are shared; the correction core is where the reference's Python
    # time went)
    cfg_py = replace(cfg, use_native=False, use_pallas_dp=False)
    sample = paths[:16]
    t0 = time.time()
    n_py, _, _ = annotate_files(sample, cfg_py, fasta, sidx)
    ref_rate = n_py / (time.time() - t0)

    print(json.dumps({
        "metric": "reads_resquiggled_per_sec",
        "value": round(ours, 1),
        "unit": "reads/s",
        "vs_baseline": round(ours / max(ref_rate, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
