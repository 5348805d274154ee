#!/usr/bin/env python
"""Per-piece stem profiling on the attached accelerator.

Times the conv1 block (the measured MXU-underfill hotspot, ROADMAP r1) and
the full folded-BN forward at bs=32, with distinct inputs per dispatch (the
axon transport caches identical dispatches).

Usage: python scripts/profile_stem.py [--bs 32] [--iters 20]
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
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    B = args.bs
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  dtype={args.dtype}")

    def conv(x, w, b, strides=(1, 1)):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y + b, 0.0).astype(x.dtype)

    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, 64)), dt)
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 64)), dt)
    b64 = jnp.asarray(rng.normal(0, 0.05, (64,)), jnp.float32)

    xs3 = [jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)), dt) for _ in range(4)]
    xs64 = [jnp.asarray(rng.normal(0, 1, (B, 300, 300, 64)), dt) for _ in range(4)]

    c11 = jax.jit(lambda x: conv(x, w1, b64))
    c12 = jax.jit(lambda x: conv(x, w2, b64))
    c_block = jax.jit(lambda x: conv(conv(x, w1, b64), w2, b64))

    t11 = bench(c11, xs3, args.iters)
    t12 = bench(c12, xs64, args.iters)
    tbl = bench(c_block, xs3, args.iters)

    fl11 = B * 300 * 300 * 64 * 3 * 9 * 2
    fl12 = B * 300 * 300 * 64 * 64 * 9 * 2
    print(f"conv1_1 (3->64):  {t11*1e3:7.3f} ms   {fl11/t11/1e12:6.2f} TFLOP/s")
    print(f"conv1_2 (64->64): {t12*1e3:7.3f} ms   {fl12/t12/1e12:6.2f} TFLOP/s")
    print(f"conv1 block:      {tbl*1e3:7.3f} ms   {(fl11+fl12)/tbl/1e12:6.2f} TFLOP/s")

    # conv2 block for contrast (128 lanes, well shaped)
    w3 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 128)), dt)
    w4 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 128, 128)), dt)
    b128 = jnp.asarray(rng.normal(0, 0.05, (128,)), jnp.float32)
    xs150 = [jnp.asarray(rng.normal(0, 1, (B, 150, 150, 64)), dt) for _ in range(4)]
    c2 = jax.jit(lambda x: conv(conv(x, w3, b128), w4, b128))
    t2 = bench(c2, xs150, args.iters)
    fl2 = B * 150 * 150 * (64 * 128 + 128 * 128) * 9 * 2
    print(f"conv2 block:      {t2*1e3:7.3f} ms   {fl2/t2/1e12:6.2f} TFLOP/s")

    # full folded forward
    from ssdx.export import fold_batchnorm
    from ssdx.model import SSD300

    base = SSD300(num_classes=6, dtype=dt)
    variables = fold_batchnorm(base.init_variables(jax.random.key(0)))
    model = SSD300(num_classes=6, dtype=dt, fold_bn=True)
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
    tf = bench(fwd, xs3, args.iters)
    print(f"full fwd (folded): {tf*1e3:7.3f} ms   ({B/tf:,.0f} img/s)")


if __name__ == "__main__":
    main()
