"""Backend capability/selection for the banded-DP kernel.

The compute layer has two implementations of the banded-DP hot kernel: a
portable XLA (lax.scan / vmap) path and a Pallas/Mosaic path.  Measured
head-to-head on the real chip (TPU v5 lite over the tunneled 'axon'
plugin, bit-identical outputs):

    B=128 reads x M=2048:  lax.scan 47.4 ms   pallas 58.7 ms   (r3)
    B= 64 reads x M=4096:  lax.scan 64.7 ms   pallas 59.7 ms   (r3)

At the short-read buckets the XLA scan matches or beats the hand-written
kernel (the DP is traceback/D2H-bound, not compute-bound); from the 4 kb
bucket up the Pallas kernel pulls ahead.  Selection is therefore
PER LENGTH BUCKET: scan below PALLAS_MIN_M, Pallas at or above it on real
TPU backends.  NANOMOD_FORCE_PALLAS=1 forces Pallas everywhere,
NANOMOD_DISABLE_PALLAS=1 wins over everything (the CPU interpreter is
always slower than the scan, so non-TPU backends never auto-select it).
"""

from __future__ import annotations

import functools
import os

# measured crossover (see module docstring): scan wins at <=2 kb, Pallas
# from 4 kb up
PALLAS_MIN_M = int(os.environ.get("NANOMOD_PALLAS_MIN_M", 4096))


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        import jax
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def pallas_supported(m_bucket: int | None = None) -> bool:
    """Whether the Pallas DP kernel should run for this length bucket.

    m_bucket None = legacy query (any-bucket): true only when forced.
    """
    if os.environ.get("NANOMOD_DISABLE_PALLAS"):
        return False
    if os.environ.get("NANOMOD_FORCE_PALLAS"):
        return True
    if m_bucket is None:
        return False
    return m_bucket >= PALLAS_MIN_M and _on_tpu()
