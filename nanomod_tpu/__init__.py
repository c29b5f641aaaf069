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

from nanomod_tpu.config import DetectConfig, AnnotateConfig, SimulateConfig  # noqa: F401
