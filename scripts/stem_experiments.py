#!/usr/bin/env python
"""Stem conv packing experiments on the attached accelerator.

The conv1 block (64-ch convs at 300x300) underfills the MXU lane dim
(N=64 of 128). Candidate fixes measured here:

  A. baseline: plain NHWC convs (what the model runs today)
  B. pair-packed conv1_2: express "two adjacent output pixels" as one
     width-4 stride-2 conv with 128 output channels (lanes full), then a
     free reshape back to [B,300,300,64].  Weights [3,4,64,128] hold two
     shifted copies of w2 (structured zeros); 1.33x the MACs but the MXU
     runs with full lanes.
  C. B + fused 2x2 maxpool consumer (what the model actually needs next).
  D. pair-packing for conv1_1 as well (K=36 tiny; likely bandwidth-bound).

Usage: python scripts/stem_experiments.py [--bs 32] [--iters 20]
(run with PYTHONPATH including /root/.axon_site for the TPU backend)
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


def pack_pair_weights(w: np.ndarray) -> np.ndarray:
    """[3,3,cin,cout] -> [3,4,cin,2*cout] two-pixel packing.

    Output channel 64*g + c (g = output-pixel parity) taps kernel col
    kw = tap + g, so W[kh, kw, :, g*cout + c] = w[kh, kw - g, :, c].
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    wp = np.zeros((3, 4, cin, 2 * cout), w.dtype)
    for g in range(2):
        wp[:, g : g + 3, :, g * cout : (g + 1) * cout] = w
    return wp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    B = args.bs
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")

    w1 = rng.normal(0, 0.05, (3, 3, 3, 64)).astype(np.float32)
    w2 = rng.normal(0, 0.05, (3, 3, 64, 64)).astype(np.float32)
    b1 = rng.normal(0, 0.05, (64,)).astype(np.float32)
    b2 = rng.normal(0, 0.05, (64,)).astype(np.float32)

    def conv(x, w, b, strides=(1, 1), padding="SAME"):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype), window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y + jnp.asarray(b, jnp.float32), 0.0).astype(x.dtype)

    def pool(x):
        from flax import linen as nn

        return nn.max_pool(x, (2, 2), strides=(2, 2))

    w2p = pack_pair_weights(w2)
    b2p = np.concatenate([b2, b2])
    w1p = pack_pair_weights(w1)
    b1p = np.concatenate([b1, b1])

    def conv2_pair(y1):
        y = conv(y1, w2p, b2p, strides=(1, 2), padding=((1, 1), (1, 2)))
        return y.reshape(y.shape[0], 300, 300, 64)

    def conv1_pair(x):
        y = conv(x, w1p, b1p, strides=(1, 2), padding=((1, 1), (1, 2)))
        return y.reshape(y.shape[0], 300, 300, 64)

    xs3 = [jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)), dt) for _ in range(4)]
    xs64 = [jnp.asarray(rng.normal(0, 1, (B, 300, 300, 64)), dt) for _ in range(4)]

    # correctness first (small batch, vs baseline)
    xa = xs64[0][:2]
    ref = conv(xa, w2, b2)
    got = conv2_pair(xa)
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    print(f"pair-packed conv1_2 max err vs baseline: {err:.5f}")
    ref1 = conv(xs3[0][:2], w1, b1)
    got1 = conv1_pair(xs3[0])[:2]
    err1 = jnp.max(jnp.abs(ref1.astype(jnp.float32) - got1.astype(jnp.float32)))
    print(f"pair-packed conv1_1 max err vs baseline: {err1:.5f}")

    fl11 = B * 300 * 300 * 64 * 3 * 9 * 2
    fl12 = B * 300 * 300 * 64 * 64 * 9 * 2

    cases = {
        "A  conv1_1 base": (jax.jit(lambda x: conv(x, w1, b1)), xs3, fl11),
        "A  conv1_2 base": (jax.jit(lambda x: conv(x, w2, b2)), xs64, fl12),
        "B  conv1_2 pair": (jax.jit(conv2_pair), xs64, fl12),
        "D  conv1_1 pair": (jax.jit(conv1_pair), xs3, fl11),
        "A  block+pool base": (
            jax.jit(lambda x: pool(conv(conv(x, w1, b1), w2, b2))), xs3, fl11 + fl12),
        "C  block+pool pair": (
            jax.jit(lambda x: pool(conv2_pair(conv(x, w1, b1)))), xs3, fl11 + fl12),
        "C2 block+pool pair2": (
            jax.jit(lambda x: pool(conv2_pair(conv1_pair(x)))), xs3, fl11 + fl12),
    }
    for name, (fn, xs, fl) in cases.items():
        t = bench(fn, xs, args.iters)
        print(f"{name}: {t*1e3:7.3f} ms   {fl/t/1e12:6.2f} TFLOP/s(useful)")


if __name__ == "__main__":
    main()
