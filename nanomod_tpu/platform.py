"""Backend capability/selection for the banded-DP kernel.

The compute layer has two implementations of the banded-DP hot kernel: a
portable XLA (lax.scan / vmap) path and a Pallas/Mosaic path.  Measured
head-to-head on the real chip (TPU v5 lite over the tunneled 'axon'
plugin, 2026-08-18, bit-identical outputs):

    B=128 reads x M=2048:  lax.scan 47.4 ms   pallas 58.7 ms
    B= 64 reads x M=4096:  lax.scan 64.7 ms   pallas 59.7 ms

At the production read-length bucket (~2 kb) the XLA scan matches or beats
the hand-written kernel — the DP is traceback/D2H-bound, not compute-bound
— so the scan path is the DEFAULT on every backend and Pallas is opt-in
(NANOMOD_FORCE_PALLAS=1) for long-read workloads where it pulls ahead.
(Round-1 note about Mosaic hanging on axon is obsolete: current axon
executes Mosaic kernels correctly; see README "Pallas status".)
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    """True when the Pallas DP kernel should be used on this backend.

    Defaults to the lax.scan path everywhere (measured as fast or faster
    at production shapes — see module docstring); NANOMOD_FORCE_PALLAS=1
    opts in on any real-TPU backend, NANOMOD_DISABLE_PALLAS=1 wins over
    everything.  The CPU interpreter is always slower than the scan.
    """
    if os.environ.get("NANOMOD_DISABLE_PALLAS"):
        return False
    if os.environ.get("NANOMOD_FORCE_PALLAS"):
        return True
    return False
