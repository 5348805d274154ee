#!/usr/bin/env python
"""On-chip CORRECTNESS check of the fused Pallas stem kernel vs the XLA
conv oracle (--check).  For timing, use scripts/bench_stem_one.py — this
script's loop timing predates the trustworthy chained/slope-fit protocol
and is kept only for the correctness comparison.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stem_kernel.py --check --iters 2
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, inputs, iters):
    out = fn(inputs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(inputs[i % len(inputs)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--check", action="store_true", help="also verify vs XLA oracle")
    args = ap.parse_args()
    B = args.bs
    dt = jnp.bfloat16

    from ssdx.ops.pallas_stem import stem_conv_pool

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    w1 = rng.normal(0, 0.15, (3, 3, 3, 64)).astype(np.float32)
    b1 = rng.normal(0, 0.3, (64,)).astype(np.float32)
    w2 = rng.normal(0, 0.08, (3, 3, 64, 64)).astype(np.float32)
    b2 = rng.normal(0, 0.3, (64,)).astype(np.float32)
    params = {
        "ConvBNRelu_0": {"Conv_0": {"kernel": w1, "bias": b1}},
        "ConvBNRelu_1": {"Conv_0": {"kernel": w2, "bias": b2}},
    }

    def conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y + b, 0.0).astype(x.dtype)

    def xla_block(x):
        y = conv(conv(x, w1, b1), w2, b2)
        Bx, H, W, C = y.shape
        return y.reshape(Bx, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))

    pallas_block = jax.jit(lambda x: stem_conv_pool(x, params, interpret=False))
    xla_block_j = jax.jit(xla_block)

    xs = [jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)), dt) for _ in range(4)]

    if args.check:
        ref = np.asarray(xla_block_j(xs[0][:2]).astype(jnp.float32))
        got = np.asarray(stem_conv_pool(xs[0][:2], params, interpret=False)).astype(np.float32)
        err = np.abs(got - ref) / (np.abs(ref) + 1.0)
        print(f"TPU kernel vs XLA oracle: max rel err {err.max():.5f}")

    useful = B * 300 * 300 * 64 * (3 * 9 + 64 * 9) * 2
    t_xla = bench(xla_block_j, xs, args.iters)
    print(f"XLA   conv block+pool: {t_xla*1e3:7.3f} ms  {useful/t_xla/1e12:6.2f} TFLOP/s")
    t_pal = bench(pallas_block, xs, args.iters)
    print(f"Pallas stem kernel:    {t_pal*1e3:7.3f} ms  {useful/t_pal/1e12:6.2f} TFLOP/s")
    print(f"speedup: {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
