"""Backend capability detection.

The compute layer has two implementations of every hot kernel: a portable
XLA (lax.scan / vmap) path and a Pallas/Mosaic path.  Pallas requires a
real TPU runtime — the CPU interpreter is slower than the XLA scan, and
experimental tunneled PJRT backends (plugin 'axon') compile Mosaic kernels
but hang executing them — so kernel selection funnels through here.
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    """True when Pallas kernels can actually EXECUTE on the default backend.

    Override with NANOMOD_FORCE_PALLAS=1 (e.g. on a future axon version
    that fixes Mosaic execution) or NANOMOD_DISABLE_PALLAS=1.
    """
    if os.environ.get("NANOMOD_DISABLE_PALLAS"):
        return False
    if os.environ.get("NANOMOD_FORCE_PALLAS"):
        return True
    import jax

    if jax.default_backend() != "tpu":
        return False
    try:
        version = jax.devices()[0].client.platform_version
    except (IndexError, AttributeError):
        return False
    return "axon" not in version.lower()
