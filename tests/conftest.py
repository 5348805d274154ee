"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so that data-parallel pjit/sharding
paths are exercised without TPU hardware (the standard JAX trick; see
jax.config xla_force_host_platform_device_count).  Must run before jax import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Pin the CPU ISA so persistently cached XLA:CPU executables are reloadable:
# without this, the AOT cache records compile-machine features that don't
# round-trip on this host (the loader warns about SIGILL risk).
if "xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=AVX2"
# 8 virtual devices time-slice the host's cores (possibly ONE core); a slow
# shard can hold a collective rendezvous far past the default terminate
# timeout, which SIGABRTs the process ("Termination timeout for ... exceeded.
# Exiting to ensure a consistent program state").  Give the rendezvous the
# same order of patience as a cold XLA:CPU compile.
if "collective" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# Force the CPU backend (8 virtual devices) even when a TPU plugin is
# installed; config-level selection also skips the TPU plugin's slow init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the SSD300 fwd+bwd programs take minutes to
# compile on CPU; the cache also dedups identical programs across tests in
# one run.  Safe only with the ISA pin above.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ssdx_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
