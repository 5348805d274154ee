#!/usr/bin/env python
"""Minimal repro: Pallas custom calls inside shard_map on the tunneled
(axon) transport (benchmarks/run.py bench_batched note).

Observed in r4: `benchmarks/run.py batched --mesh` with the fused Pallas
stem stalls — dispatches hang — while the identical program with plain
XLA convs under shard_map runs at full speed, and the same Pallas kernel
OUTSIDE shard_map runs fine.  This script bisects the failure with three
cases of increasing size on a 1-device mesh (the smallest shard_map):

  tiny    — a [256,256] elementwise Pallas kernel inside shard_map
  matmul  — a [1024,1024]x[1024,1024] tiled Pallas matmul inside shard_map
  stem    — the production stem kernel (ssdx/ops/pallas_stem.py) inside
            shard_map at bs=8

Each case runs the same kernel OUTSIDE shard_map first (control), then
inside, with a 120 s watchdog; a case that only hangs inside shard_map is
the transport/shard_map interaction, not the kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/repro_shardmap_pallas.py [case ...]
"""
from __future__ import annotations

import functools
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec as P


def _run_with_watchdog(name: str, fn, timeout_s: float = 120.0) -> str:
    """Run fn() in a thread; report ok/HANG (daemon thread leaks on hang —
    acceptable for a repro script)."""
    result: dict = {}

    def target():
        try:
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            # materialize on host: block_until_ready can lie on this
            # transport (README "Measurement protocol")
            float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0],
                          dtype=jnp.float32))
            result["dt"] = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            result["err"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=target, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        print(f"  {name}: HANG (> {timeout_s:.0f}s)", flush=True)
        return "hang"
    if "err" in result:
        print(f"  {name}: ERROR {result['err']}", flush=True)
        return "error"
    print(f"  {name}: ok ({result['dt']*1e3:.1f} ms)", flush=True)
    return "ok"


def _ew_kernel(x_ref, o_ref):
    o_ref[...] = jnp.tanh(x_ref[...]) * 1.5


def case_tiny(mesh):
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (256, 256)),
                    jnp.float32)

    def k(x):
        return pl.pallas_call(
            _ew_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
        )(x)

    _run_with_watchdog("tiny outside", jax.jit(k).lower(x).compile().__call__
                       if False else lambda: jax.jit(k)(x))
    sm = jax.jit(jax.shard_map(k, mesh=mesh, in_specs=P("data"),
                               out_specs=P("data"), check_vma=False))
    _run_with_watchdog("tiny inside shard_map", lambda: sm(x))


def _mm_kernel(x_ref, y_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], y_ref[...],
                         preferred_element_type=jnp.float32)


def case_matmul(mesh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1024, 1024)), jnp.bfloat16)
    y = jnp.asarray(rng.normal(0, 1, (1024, 1024)), jnp.bfloat16)

    def k(x, y):
        return pl.pallas_call(
            _mm_kernel,
            grid=(4, 4),
            in_specs=[pl.BlockSpec((256, 1024), lambda i, j: (i, 0)),
                      pl.BlockSpec((1024, 256), lambda i, j: (0, j))],
            out_specs=pl.BlockSpec((256, 256), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((1024, 1024), jnp.float32),
        )(x, y)

    _run_with_watchdog("matmul outside", lambda: jax.jit(k)(x, y))
    sm = jax.jit(jax.shard_map(k, mesh=mesh, in_specs=(P("data"), P()),
                               out_specs=P("data"), check_vma=False))
    _run_with_watchdog("matmul inside shard_map", lambda: sm(x, y))


def case_stem(mesh):
    from ssdx.export import fold_batchnorm
    from ssdx.model import SSD300
    from ssdx.ops.pallas_stem import stem_conv_pool

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        base = SSD300(num_classes=6, dtype=jnp.bfloat16)
        variables = fold_batchnorm(
            base.init_variables(jax.random.key(0), batch_size=1))
    variables = jax.device_put(variables, jax.devices()[0])
    params = variables["params"]
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (8, 300, 300, 3)).astype(np.float32))

    def k(images):
        return stem_conv_pool(images.astype(jnp.bfloat16), params)

    _run_with_watchdog("stem outside", lambda: jax.jit(k)(x))
    sm = jax.jit(jax.shard_map(k, mesh=mesh,
                               in_specs=P("data"), out_specs=P("data"),
                               check_vma=False))
    _run_with_watchdog("stem inside shard_map", lambda: sm(x))


def main() -> None:
    cases = sys.argv[1:] or ["tiny", "matmul", "stem"]
    devs = jax.devices()
    print(f"backend={jax.default_backend()} devices={devs}")
    mesh = Mesh(np.array(devs[:1]), axis_names=("data",))
    for c in cases:
        print(f"case {c}:", flush=True)
        {"tiny": case_tiny, "matmul": case_matmul, "stem": case_stem}[c](mesh)


if __name__ == "__main__":
    main()
