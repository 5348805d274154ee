"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so that data-parallel pjit/sharding
paths are exercised without TPU hardware (the standard JAX trick; see
jax.config xla_force_host_platform_device_count).  Must run before jax import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force the CPU backend (8 virtual devices) even when a TPU plugin is
# installed; config-level selection also skips the TPU plugin's slow init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# NOTE: do NOT enable the persistent compilation cache here.  The XLA:CPU AOT
# cache records the compile machine's ISA feature set; on this host the
# recorded features don't round-trip (the loader warns about
# "+prefer-no-scatter ... SIGILL") and reloading cached executables aborts
# the process mid-suite.  Recompiling is slower but reliable.
