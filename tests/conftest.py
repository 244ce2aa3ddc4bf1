"""Test configuration.

Tests run on CPU with 8 virtual devices (mirrors a TPU mesh without hardware,
per the driver's dryrun contract) and float64 enabled so that physics parity
vs the MuJoCo C oracle can be asserted to tight tolerances.

Note: this image preimports jax via a sitecustomize that pins the axon/TPU
platform, so the platform must be overridden through jax.config *before the
first backend use* rather than via JAX_PLATFORMS alone.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

from brax_tracking_tpu.cache_guard import ensure_clean_cache  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the physics step takes minutes to compile on
# CPU; cache hits make repeated test runs fast. ensure_clean_cache wipes it
# automatically when a previous run crashed mid-compile (truncated entries
# segfault jax's cache reader), so a bare `pytest tests/` self-heals.
jax.config.update(
    "jax_compilation_cache_dir", ensure_clean_cache("/tmp/btt_jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
