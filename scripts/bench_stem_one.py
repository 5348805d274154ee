#!/usr/bin/env python
"""Benchmark ONE stem configuration in a fresh process.

The axon transport produced physically-impossible timings when many
variants were benchmarked inside one process (see bench_stem_sweep.py
history); standalone single-config runs are reproducible.  Protocol:
salted inputs, one distinct input per timed dispatch, pipelined (await
only the last — per-dispatch awaits measure the ~50 ms tunnel RPC
latency, not the kernel).

Usage:
  python scripts/bench_stem_one.py xla
  python scripts/bench_stem_one.py pallas --r 30
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["xla", "pallas"])
    ap.add_argument("--r", type=int, default=None, help="rows per grid step")
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()
    B = args.bs

    import ssdx.ops.pallas_stem as ps

    if args.r is not None:
        assert 300 % args.r == 0 and args.r % 2 == 0, args.r
        ps._R = args.r

    rng = np.random.default_rng(time.time_ns() % (2**31))
    w1 = rng.normal(0, 0.15, (3, 3, 3, 64)).astype(np.float32)
    b1 = rng.normal(0, 0.3, (64,)).astype(np.float32)
    w2 = rng.normal(0, 0.08, (3, 3, 64, 64)).astype(np.float32)
    b2 = rng.normal(0, 0.3, (64,)).astype(np.float32)
    params = {
        "ConvBNRelu_0": {"Conv_0": {"kernel": w1, "bias": b1}},
        "ConvBNRelu_1": {"Conv_0": {"kernel": w2, "bias": b2}},
    }

    if args.variant == "pallas":
        fn = jax.jit(lambda x: ps.stem_conv_pool(x, params, interpret=False))
    else:
        def conv(x, w, b):
            y = jax.lax.conv_general_dilated(
                x, jnp.asarray(w, x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y + b, 0.0).astype(x.dtype)

        @jax.jit
        def fn(x):
            y = conv(conv(x, w1, b1), w2, b2)
            return y.reshape(B, 150, 2, 150, 2, 64).max(axis=(2, 4))

    xs = [jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)), jnp.bfloat16)
          for _ in range(args.iters + 1)]
    out = fn(xs[-1])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for x in xs[: args.iters]:
        out = fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    useful = B * 300 * 300 * 64 * (3 * 9 + 64 * 9) * 2
    tag = f"{args.variant}" + (f" R={ps._R}" if args.variant == "pallas" else "")
    print(f"{tag}: {dt*1e3:7.3f} ms  {useful/dt/1e12:6.2f} TFLOP/s(useful)  bs={B}")


if __name__ == "__main__":
    main()
