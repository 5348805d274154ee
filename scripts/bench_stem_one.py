#!/usr/bin/env python
"""Benchmark ONE stem configuration in a fresh process.

Trustworthy-timing protocol for the tunneled experimental transport
(which intermittently returned physically impossible sub-ms timings for
pipelined dispatch streams, e.g. 6,800 "TFLOP/s" on an 8 ms conv block):

  * salted inputs, one DISTINCT input per timed dispatch;
  * a DEVICE-SIDE DEPENDENCY CHAIN: each dispatch consumes a scalar
    produced by the previous one, scaled by 1e-30 so the value is
    numerically invisible but the data dependency is NOT constant-foldable
    (an ``s * 0`` chain gets DCE'd by XLA, un-serializing the stream);
  * HOST MATERIALIZATION of the final chained scalar — on this transport
    ``block_until_ready`` can signal before the device has actually
    executed, so only a value forced to host proves completion;
  * a SLOPE FIT over several chain lengths n: total(n) = RPC + n*T
    separates the ~46 ms fixed tunnel round-trip from the true per-iter
    time T (measured: conv block T = 5.1 ms where unchained pipelined
    timing reported anywhere from 0.03 to 8.7 ms depending on transport
    mood).

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
        @jax.jit
        def fn(x, s):
            out = ps.stem_conv_pool(
                x + (s * 1e-30).astype(x.dtype), params, interpret=False)
            return out, jnp.sum(out[..., 0], dtype=jnp.float32)
    else:
        def conv(x, w, b):
            y = jax.lax.conv_general_dilated(
                x, jnp.asarray(w, x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y + b, 0.0).astype(x.dtype)

        @jax.jit
        def fn(x, s):
            y = conv(conv(x + (s * 1e-30).astype(x.dtype), w1, b1), w2, b2)
            out = y.reshape(B, 150, 2, 150, 2, 64).max(axis=(2, 4))
            return out, jnp.sum(out[..., 0], dtype=jnp.float32)

    ns = (2, 4, 8, 16, 24)
    xs = [jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)), jnp.bfloat16)
          for _ in range(max(ns) + 1)]
    out, s = fn(xs[-1], jnp.float32(0.0))
    float(s)  # warmup incl. result materialization
    totals = []
    for n in ns:
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for x in xs[:n]:
            out, s = fn(x, s)  # device-side chain
        float(s)  # force actual completion
        totals.append(time.perf_counter() - t0)
    a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
    slope, icept = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
    useful = B * 300 * 300 * 64 * (3 * 9 + 64 * 9) * 2
    tag = f"{args.variant}" + (f" R={ps._R}" if args.variant == "pallas" else "")
    print(f"{tag}: {slope*1e3:7.3f} ms/iter (fixed {icept*1e3:.1f} ms)  "
          f"{useful/slope/1e12:6.2f} TFLOP/s(useful)  bs={B}")


if __name__ == "__main__":
    main()
