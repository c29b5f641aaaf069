"""nanomod_tpu — a TPU-native nanopore DNA-modification detection engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of WGLab/NanoMod
(reference: /root/reference — pure Python 2.7 + external bwa/samtools/R):

  * ``Annotate``  — per-read indel-corrected resquiggle: raw-current events are
    re-assigned to reference bases via a banded affine-gap DP (replacing
    ``bwa mem`` + greedy resegmentation, ref myRefBaseSignalAnnotation.py).
  * ``detect``    — per-genomic-position two-sample statistics (KS,
    Mann-Whitney U, Welch t) across grouped normalized signal means, plus
    neighbor p-value combination (weighted Stouffer / Fisher) and ranking
    (ref myDetect.py).
  * ``simulate`` / ``simulat2`` / ``DownSampling`` — evaluation harness that
    mixes case/control reads and measures the rank of a known modified site
    (ref mySimulate.py, mySimulat2.py, myDownSampling0.py).

Architecture is TPU-first: position-major dense signal pools, fused
sort/scan statistical kernels with exact integer components, genome-
coordinate sharding over a device mesh (`shard_map` + ppermute halo
exchange for the neighbor-combination stencil), and a banded-DP aligner
with both lax.scan (default) and Pallas implementations.
"""

__version__ = "0.2.0"


_MALLOC_TUNED = False


def tune_malloc():
    """Keep large heap buffers out of per-allocation mmap/munmap.

    glibc services every allocation above M_MMAP_THRESHOLD (128 kB
    default) with a fresh mmap and returns it to the kernel on free, so
    each large numpy temporary faults its pages in from scratch.  On this
    class of virtualized host a first-touch page fault streams at
    ~0.1-0.2 GB/s versus ~8 GB/s for reused pages (measured: np.copy of
    400 MB = 0.2 GB/s cold, 8 GB/s once the arena retains the pages) —
    the host pipeline is allocation-bound, not compute-bound.  Raising
    the thresholds keeps freed blocks in the arena for reuse.  Trade-off:
    RSS stays at the high-water mark; peak memory is unchanged, which is
    what actually matters.

    Called lazily from the pipeline entry points (Annotate/detect/harness
    drivers) rather than at package import, so a host application that
    merely imports nanomod_tpu keeps its own malloc behavior (ADVICE r4).
    Disable with NANOMOD_NO_MALLOC_TUNE=1."""
    import ctypes
    import os
    import sys

    global _MALLOC_TUNED
    if _MALLOC_TUNED:
        return
    _MALLOC_TUNED = True
    if os.environ.get("NANOMOD_NO_MALLOC_TUNE") == "1":
        return
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 2**31 - 1)
        libc.mallopt(M_TRIM_THRESHOLD, 2**31 - 1)
    except OSError:
        pass

from nanomod_tpu.config import DetectConfig, AnnotateConfig, SimulateConfig  # noqa: F401
