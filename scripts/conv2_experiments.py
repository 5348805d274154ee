#!/usr/bin/env python
"""conv2 block layout experiments (round-4 profile follow-up).

The bs=16 train profile (scripts/bench_train_prefix.py) puts the conv2
block (conv2_1 64->128 + BN + ReLU + conv2_2 128->128 + BN + ReLU + pool,
reference SSD_from_scratch.py:62-66) at ~4.8 ms fwd+bwd while its bf16
roofline is ~2.4 ms.  The suspected cause is the same one the stem had:
64-channel activations fill half of each 128-lane register, so conv2_1's
loads (and the backward's dx writes) run at half bandwidth/MXU occupancy.

Variants (standalone fwd+bwd, slope-fit, chained):
  base      natural [B,150,150,64] input, plain flax-style ops
  packed2   input pre-packed [B,150,75,128] (two adjacent columns' channels
            in lanes, the fused stem's pair layout); conv2_1 done as TWO
            phase convs with [3,2,128,128] kernels (1.33x MACs, full lanes)
            whose outputs interleave to natural [B,150,150,128]; the rest of
            the block unchanged.  The pack itself is assumed FREE (producer
            side — the fused stem kernel would emit it); the unpack is
            measured (it is lane-aligned: stack + reshape on 128 boundaries).
  packedw3  same packed input, ONE conv with a [3,3,128,256] zero-phased
            kernel (2x MACs, no interleave — output reshapes [75,256] ->
            [150,128] for free in row-major).

Each variant takes grads w.r.t. the conv/BN params AND the input (dx must
flow in-program), consumes every grad leaf, and slope-fits chained
iterations (measurement protocol: README, scripts/bench_stem_one.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/conv2_experiments.py VARIANT [--bs 16]
"""
from __future__ import annotations

import argparse
import time

import jax
# Persistent compile cache (jax.config.update required on jax 0.9.0; the
# env var alone is ignored — see bench.py).
import os as _os
jax.config.update("jax_compilation_cache_dir",
                  _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ssdx_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

B_DEF = 16
H = 150


def _bn_relu(x, scale, bias):
    # train-mode BN: batch stats over (B,H,W), then affine + ReLU (f32 stats)
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2))
    var = xf.var(axis=(0, 1, 2))
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return jnp.maximum(y, 0.0).astype(x.dtype)


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _tail(y, p):
    """BN+ReLU -> conv2_2 -> BN+ReLU -> pool (shared across variants)."""
    y = _bn_relu(y, p["s1"], p["b1"])
    y = _conv(y, p["w2"])
    y = _bn_relu(y, p["s2"], p["b2"])
    return _pool(y)


def build(variant, B):
    rng = np.random.default_rng(0)
    f32 = np.float32
    p = {
        "w1": jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 128)).astype(f32)),
        "w2": jnp.asarray(rng.normal(0, 0.05, (3, 3, 128, 128)).astype(f32)),
        "s1": jnp.ones((128,), f32), "b1": jnp.zeros((128,), f32),
        "s2": jnp.ones((128,), f32), "b2": jnp.zeros((128,), f32),
    }
    xn = jnp.asarray(rng.normal(0, 1, (B, H, H, 64)).astype(f32)).astype(jnp.bfloat16)

    if variant == "base":
        x0 = xn

        def fwd(p, x):
            return _tail(_conv(x, p["w1"]), p)

    else:
        # packed pair layout: xp[b,r,j,c2], c2 = 64*parity + c, col = 2j+parity
        x0 = xn.reshape(B, H, H // 2, 128)

        def phase_kernels(w1):
            # even output col 2j reads cols 2j-1,2j,2j+1 = pair j-1 parity1,
            # pair j parity0, pair j parity1  -> taps (j-1, j)
            ke = jnp.zeros((3, 2, 128, 128), w1.dtype)
            ke = ke.at[:, 0, 64:128, :].set(w1[:, 0])   # col -1
            ke = ke.at[:, 1, 0:64, :].set(w1[:, 1])     # col 0
            ke = ke.at[:, 1, 64:128, :].set(w1[:, 2])   # col +1
            # odd output col 2j+1 reads cols 2j,2j+1,2j+2 -> taps (j, j+1)
            ko = jnp.zeros((3, 2, 128, 128), w1.dtype)
            ko = ko.at[:, 0, 0:64, :].set(w1[:, 0])
            ko = ko.at[:, 0, 64:128, :].set(w1[:, 1])
            ko = ko.at[:, 1, 0:64, :].set(w1[:, 2])
            return ke, ko

        if variant == "packed2":

            def fwd(p, xp):
                ke, ko = phase_kernels(p["w1"])
                dn = ("NHWC", "HWIO", "NHWC")
                ye = jax.lax.conv_general_dilated(
                    xp, ke.astype(xp.dtype), (1, 1), ((1, 1), (1, 0)),
                    dimension_numbers=dn)
                yo = jax.lax.conv_general_dilated(
                    xp, ko.astype(xp.dtype), (1, 1), ((1, 1), (0, 1)),
                    dimension_numbers=dn)
                y = jnp.stack([ye, yo], axis=3).reshape(xp.shape[0], H, H, 128)
                return _tail(y, p)

        elif variant == "packedw3":

            def fwd(p, xp):
                ke, ko = phase_kernels(p["w1"])
                # one width-3 pair conv, 256 outputs: [0:128]=even (taps j-1,j
                # at positions 0,1), [128:256]=odd (taps j,j+1 at 1,2)
                k3 = jnp.zeros((3, 3, 128, 256), p["w1"].dtype)
                k3 = k3.at[:, 0:2, :, 0:128].set(ke)
                k3 = k3.at[:, 1:3, :, 128:256].set(ko)
                dn = ("NHWC", "HWIO", "NHWC")
                y = jax.lax.conv_general_dilated(
                    xp, k3.astype(xp.dtype), (1, 1), "SAME",
                    dimension_numbers=dn)
                y = y.reshape(xp.shape[0], H, H, 128)
                return _tail(y, p)

        else:
            raise SystemExit(f"unknown variant {variant}")

    @jax.jit
    def fn(p, x, c):
        x = x + (c * 1e-30).astype(x.dtype)
        def loss(pp, xx):
            return jnp.sum(fwd(pp, xx).astype(jnp.float32))
        val, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
        acc = sum(g.astype(jnp.float32).sum() for g in jax.tree.leaves(gp))
        return val + acc * 1e-12 + gx.astype(jnp.float32).sum() * 1e-12

    return p, x0, fn


def check_parity(B=2):
    """packed conv2_1 forms must equal the natural conv numerically."""
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 128)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (B, H, H, 64)).astype(np.float32)).astype(jnp.bfloat16)
    ref = jax.lax.conv_general_dilated(
        x, w1.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    xp = x.reshape(B, H, H // 2, 128)
    ke = jnp.zeros((3, 2, 128, 128), w1.dtype)
    ke = ke.at[:, 0, 64:128, :].set(w1[:, 0])
    ke = ke.at[:, 1, 0:64, :].set(w1[:, 1])
    ke = ke.at[:, 1, 64:128, :].set(w1[:, 2])
    ko = jnp.zeros((3, 2, 128, 128), w1.dtype)
    ko = ko.at[:, 0, 0:64, :].set(w1[:, 0])
    ko = ko.at[:, 0, 64:128, :].set(w1[:, 1])
    ko = ko.at[:, 1, 0:64, :].set(w1[:, 2])
    dn = ("NHWC", "HWIO", "NHWC")
    ye = jax.lax.conv_general_dilated(xp, ke.astype(xp.dtype), (1, 1), ((1, 1), (1, 0)),
                                      dimension_numbers=dn, preferred_element_type=jnp.float32).astype(xp.dtype)
    yo = jax.lax.conv_general_dilated(xp, ko.astype(xp.dtype), (1, 1), ((1, 1), (0, 1)),
                                      dimension_numbers=dn, preferred_element_type=jnp.float32).astype(xp.dtype)
    y2 = jnp.stack([ye, yo], axis=3).reshape(B, H, H, 128)
    err2 = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - y2.astype(jnp.float32))))
    k3 = jnp.zeros((3, 3, 128, 256), w1.dtype)
    k3 = k3.at[:, 0:2, :, 0:128].set(ke)
    k3 = k3.at[:, 1:3, :, 128:256].set(ko)
    y3 = jax.lax.conv_general_dilated(xp, k3.astype(xp.dtype), (1, 1), "SAME",
                                      dimension_numbers=dn, preferred_element_type=jnp.float32).astype(xp.dtype)
    y3 = y3.reshape(B, H, H, 128)
    err3 = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - y3.astype(jnp.float32))))
    print(f"parity: packed2 maxerr {err2:.2e}  packedw3 maxerr {err3:.2e}")
    # all three convs accumulate in f32 (preferred_element_type) and round
    # once to bf16; residual error is one-ulp output rounding on O(4) values
    assert err2 < 4e-2 and err3 < 4e-2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["base", "packed2", "packedw3", "parity"])
    ap.add_argument("--bs", type=int, default=B_DEF)
    args = ap.parse_args()
    if args.variant == "parity":
        check_parity()
        return
    p, x, fn = build(args.variant, args.bs)
    c = fn(p, x, jnp.float32(0.0))
    float(fn(p, x, c))
    ns = (2, 4, 8, 16)
    totals = []
    for n in ns:
        s0 = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s0 = fn(p, x, s0)
        float(s0)
        totals.append(time.perf_counter() - t0)
    a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
    slope, icept = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
    print(f"conv2[{args.variant}]: {slope*1e3:7.3f} ms/iter "
          f"(fixed {icept*1e3:.1f} ms) bs={args.bs}")


if __name__ == "__main__":
    main()
