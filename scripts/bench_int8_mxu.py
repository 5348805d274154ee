#!/usr/bin/env python
"""Can ANY available lowering route int8 matmuls to the MXU? (VERDICT r3 #3)

The XLA path is already a measured negative (ssdx/quant.py docstring:
lax.dot int8 2048^3 = 4,358 ms vs 4.3 ms bf16 — scalar VPU code).  This
script asks the remaining question: does the Mosaic/Pallas compiler in this
toolchain emit MXU int8 matmuls (`jnp.dot(int8, int8,
preferred_element_type=int32)` inside a Pallas kernel)?  If yes, a Pallas
int8 conv for the conv2-5 blocks is worth building (reference workload:
the VGG conv stack, SSD_from_scratch.py:62-155); if no, int8 serving stays
a packaging path and README documents the wall with numbers.

Benchmarks (M=N=K=2048; INNER matmuls chained inside one jitted step so
dispatch amortizes, then host-materialized + slope-fit per the README
measurement protocol):
  pallas-int8 : tiled Pallas kernel, int8 x int8 -> int32 dot
  pallas-bf16 : same kernel shape, bf16 x bf16 -> f32 dot (control)
  xla-bf16    : plain lax.dot bf16 (roofline reference)
  xla-int8    : plain lax.dot int8 (known-bad; bounded iterations)

MEASURED (2026-08-19, v5e chip over the tunneled transport; ms per 2048^3
matmul, slope-fit over n={2,6} steps of 16 chained matmuls each):

  pallas-int8 :  0.065 ms/mm  264 TFLOP/s   <-- int8 DOES route to the MXU
  xla-bf16    :  0.090 ms/mm  191 TFLOP/s   (hardware bf16 peak ~197)
  pallas-bf16 :  0.135 ms/mm  127 TFLOP/s   (naive full-K blocking)
  xla-int8    :  ~4,358 ms/mm (measured r3, ssdx/quant.py docstring —
                 scalar VPU code; excluded from the chained run)

Conclusion: the Mosaic/Pallas compiler emits MXU int8 matmuls at ~2x the
bf16 rate in this toolchain even though plain XLA does not.  The Pallas
int8 conv backend this justifies lives in ssdx/ops/pallas_int8_conv.py.

Usage: python scripts/bench_int8_mxu.py [--skip-xla-int8] [--chained]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M = N = K = 2048
BM = BN = 256  # output tile; full-K blocks keep the kernel trivial


def _mm_kernel(a_ref, b_ref, o_ref, *, acc_t):
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=acc_t)


def _pallas_mm(a, b, acc_t):
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_t=acc_t),
        grid=(M // BM, N // BN),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, BN), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_t),
    )(a, b)


def _time(fn, a, b, chain_cast, iters=(2, 4, 8)):
    """Chained slope-fit: out feeds the next a so nothing reorders."""

    @jax.jit
    def step(a_, b_):
        o = fn(a_, b_)
        return chain_cast(o)

    a_ = step(a, b)
    jax.block_until_ready(step(a_, b))
    totals = []
    for n in iters:
        x = a
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x, b)
        jax.block_until_ready(x)
        totals.append(time.perf_counter() - t0)
    arr = np.vstack([np.asarray(iters, float), np.ones(len(iters))]).T
    slope, _ = np.linalg.lstsq(arr, np.asarray(totals), rcond=None)[0]
    return slope


def _time_chained(fn, a, b, recast, inner=16, iters=(2, 6)):
    """Chain ``inner`` matmuls inside ONE jitted step (the per-step dispatch
    on the tunneled transport is ~10 ms, swamping an 87 us kernel), thread a
    scalar carry through so steps can't overlap, and slope-fit over two
    step counts.  This is the variant that produced the recorded numbers."""

    @jax.jit
    def step(c, a_, b_):
        x = a_
        for i in range(inner):
            x = recast(fn(x, b_), c if i == 0 else None)
        return jnp.sum(x.astype(jnp.float32)) * 1e-20

    float(step(jnp.float32(0.0), a, b))  # compile
    totals = []
    for n in iters:
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            c = step(c, a, b)
        float(c)
        totals.append(time.perf_counter() - t0)
    n1, n2 = iters
    return (totals[1] - totals[0]) / (n2 - n1) / inner


def _recast_bf(o, c):
    o = o * 1e-3
    if c is not None:
        o = o + (c * 1e-30)
    return o.astype(jnp.bfloat16)


def _recast_i8(o, c):
    o = o >> 8
    if c is not None:
        o = o + c.astype(jnp.int32) % 2
    return jnp.clip(o, -127, 127).astype(jnp.int8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-xla-int8", action="store_true")
    ap.add_argument("--chained", action="store_true",
                    help="inner-chained timing (the recorded methodology)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    abf = (a8.astype(jnp.float32) / 127.0).astype(jnp.bfloat16)
    bbf = (b8.astype(jnp.float32) / 127.0).astype(jnp.bfloat16)

    flops = 2 * M * N * K

    def report(name, secs):
        print(f"{name:12s}: {secs*1e3:9.3f} ms  {flops/secs/1e12:7.2f} TFLOP/s")

    # int8 chain: clip the int32 output back into int8 range for the next a.
    to_i8 = lambda o: jnp.clip(o[:, :K] >> 8, -127, 127).astype(jnp.int8)
    to_bf = lambda o: (o[:, :K] * 1e-3).astype(jnp.bfloat16)

    if args.chained:
        report("pallas-bf16", _time_chained(
            lambda a, b: _pallas_mm(a, b, jnp.float32), abf, bbf, _recast_bf))
        report("xla-bf16", _time_chained(
            lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32),
            abf, bbf, _recast_bf))
        report("pallas-int8", _time_chained(
            lambda a, b: _pallas_mm(a, b, jnp.int32), a8, b8, _recast_i8))
        return

    report("pallas-bf16", _time(lambda a, b: _pallas_mm(a, b, jnp.float32), abf, bbf, to_bf))
    report("xla-bf16", _time(
        lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32), abf, bbf, to_bf))
    try:
        report("pallas-int8", _time(lambda a, b: _pallas_mm(a, b, jnp.int32), a8, b8, to_i8))
    except Exception as e:  # Mosaic may reject int8 dots outright
        print(f"pallas-int8 : FAILED TO COMPILE/RUN: {type(e).__name__}: {e}")
    if not args.skip_xla_int8:
        report("xla-int8", _time(
            lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32),
            a8, b8, to_i8, iters=(1, 2)))


if __name__ == "__main__":
    main()
