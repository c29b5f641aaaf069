"""Test harness: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths compile and run without TPU hardware.

Note: platform selection must go through jax.config (not the JAX_PLATFORMS
env var) — the axon TPU plugin is registered by a sitecustomize hook before
pytest starts, and letting it initialize lazily costs ~60-220s on the first
device->host transfer in every process.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
