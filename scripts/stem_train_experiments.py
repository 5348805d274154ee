#!/usr/bin/env python
"""Train-mode stem op-level experiments at bs=16 (fwd+bwd per piece).

The stem block (conv1_1 + BN + ReLU + conv1_2 + BN + ReLU + 2x2 pool) costs
~12.8 ms of the 34 ms bs=16 fwd+bwd (scripts/bench_train_prefix.py).  This
script times each piece and candidate reformulations so optimization effort
lands where the milliseconds are.  Chained + slope-fit (see
scripts/bench_stem_one.py for the transport pathologies that forces this).

Variants:
  c11        conv 3->64 @300x300, fwd + dW (no dx: image is data)
  c11_im2col same but patches (lax.conv_general_dilated_patches) + matmul
  c12        conv 64->64 @300x300, fwd + dW + dx
  bn         train-mode BatchNorm+ReLU at [B,300,300,64], fwd+bwd
  pool       2x2 maxpool eq-mask custom VJP, fwd+bwd
  stem       the full stem block fwd+bwd (sum of the above, as wired)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/stem_train_experiments.py VARIANT [--bs 16]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_fit(fn, args, ns=(2, 4, 8)):
    """fn(chain_scalar, *args) -> scalar; returns ms/iter slope."""
    c = fn(jnp.float32(0.0), *args)
    float(fn(c, *args))
    totals = []
    for n in ns:
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s, *args)
        float(s)
        totals.append(time.perf_counter() - t0)
    a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
    slope, icept = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
    return slope * 1e3, icept * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["c11", "c11_im2col", "c12", "c12f",
                                        "c12dx", "c12dw", "bn", "pool",
                                        "bnpool", "brp", "brp_nosplit",
                                        "stem", "stem_fused"])
    ap.add_argument("--bs", type=int, default=16)
    args = ap.parse_args()
    B = args.bs
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)).astype(np.float32)).astype(dt)
    x64 = jnp.asarray(rng.normal(0, 1, (B, 300, 300, 64)).astype(np.float32)).astype(dt)
    w11 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)).astype(np.float32))
    w12 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 64)).astype(np.float32))

    dn = jax.lax.conv_dimension_numbers((B, 300, 300, 3), (3, 3, 3, 64),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w):
        # bf16 in/out like the flax model path; preferred_element_type=f32
        # would make the transpose rules see mismatched operand dtypes.
        return jax.lax.conv_general_dilated(
            x, w.astype(dt), (1, 1), "SAME", dimension_numbers=dn)

    if args.variant == "c11":
        def fn(c, x, w):
            xx = x + (c * 1e-30).astype(x.dtype)
            def f(wp):
                return jnp.sum(conv(xx, wp))
            v, g = jax.value_and_grad(f)(w)
            return v * 1e-12 + jnp.sum(g) * 1e-12
        fn = jax.jit(fn)
        ms, fixed = slope_fit(fn, (x3, w11))

    elif args.variant == "c11_im2col":
        def fn(c, x, w):
            xx = x + (c * 1e-30).astype(x.dtype)
            def f(wp):
                p = jax.lax.conv_general_dilated_patches(
                    xx, (3, 3), (1, 1), "SAME",
                    dimension_numbers=dn)  # [B,300,300,27]
                y = jnp.dot(p.reshape(-1, 27),
                            wp.astype(dt).reshape(27, 64),
                            preferred_element_type=jnp.float32)
                return jnp.sum(y)
            # patches order is CHW of the window for NHWC input; reorder w to
            # match: HWIO -> (I,H,W),O
            wp0 = jnp.transpose(w, (2, 0, 1, 3))
            v, g = jax.value_and_grad(lambda ww: f(ww))(wp0)
            return v * 1e-12 + jnp.sum(g) * 1e-12
        fn = jax.jit(fn)
        ms, fixed = slope_fit(fn, (x3, w11))

    elif args.variant == "c12":
        def fn(c, x, w):
            xx = x + (c * 1e-30).astype(x.dtype)
            def f(xw):
                xi, wp = xw
                return jnp.sum(conv(xi, wp))
            v, g = jax.value_and_grad(f)((xx, w))
            return v * 1e-12 + jnp.sum(g[1]) * 1e-12 + jnp.sum(g[0].astype(jnp.float32)) * 1e-12
        fn = jax.jit(fn)
        ms, fixed = slope_fit(fn, (x64, w12))

    elif args.variant in ("c12f", "c12dx", "c12dw"):
        # conv1_2 cost split: forward only / forward+dx / forward+dW
        def fn(c, x, w):
            xx = x + (c * 1e-30).astype(x.dtype)
            if args.variant == "c12f":
                return jnp.sum(conv(xx, w).astype(jnp.float32)) * 1e-12
            if args.variant == "c12dx":
                v, g = jax.value_and_grad(
                    lambda xi: jnp.sum(conv(xi, w).astype(jnp.float32)))(xx)
                return v * 1e-12 + jnp.sum(g.astype(jnp.float32)) * 1e-12
            v, g = jax.value_and_grad(
                lambda wp: jnp.sum(conv(xx, wp).astype(jnp.float32)))(w)
            return v * 1e-12 + jnp.sum(g) * 1e-12
        fn = jax.jit(fn)
        ms, fixed = slope_fit(fn, (x64, w12))

    elif args.variant in ("bnpool", "brp", "brp_nosplit"):
        # The BN+ReLU+pool stem tail, fwd+bwd: XLA autodiff of the unfused
        # composition vs the fused recompute-VJP op (ssdx/ops/fused_bn_pool).
        from flax import linen as nn
        from ssdx.model import _max_pool
        from ssdx.ops.fused_bn_pool import bn_relu_pool

        gamma = jnp.asarray(rng.normal(1, 0.2, 64).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.2, 64).astype(np.float32))

        if args.variant == "bnpool":
            mod = nn.BatchNorm(use_running_average=False, momentum=0.9,
                               epsilon=1e-5, dtype=dt, param_dtype=jnp.float32)
            vs = mod.init(jax.random.key(0), x64)
            def tail(x, g, b):
                y, mut = mod.apply(
                    {"params": {"scale": g, "bias": b},
                     "batch_stats": vs["batch_stats"]},
                    x, mutable=["batch_stats"])
                p = _max_pool(nn.relu(y))
                bs = mut["batch_stats"]
                return p, bs["mean"], bs["var"]
        else:
            split = args.variant == "brp"
            def tail(x, g, b):
                return bn_relu_pool(x, g, b, 1e-5, False, split)

        def fn(c, x, g, b):
            xx = x + (c * 1e-30).astype(x.dtype)
            def f(args_):
                xi, gg, bb = args_
                p, mean, var = tail(xi, gg, bb)
                return (jnp.sum(p.astype(jnp.float32))
                        + jnp.sum(mean) * 1e-3 + jnp.sum(var) * 1e-3)
            v, gr = jax.value_and_grad(f)((xx, g, b))
            acc = sum(t.astype(jnp.float32).sum() for t in jax.tree.leaves(gr))
            return v * 1e-12 + acc * 1e-12
        fn = jax.jit(fn)
        ms, fixed = slope_fit(fn, (x64, gamma, beta))

    elif args.variant == "bn":
        from flax import linen as nn

        mod = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, dtype=dt, param_dtype=jnp.float32)
        vs = mod.init(jax.random.key(0), x64)

        def fn(c, x, p):
            xx = x + (c * 1e-30).astype(x.dtype)
            def f(xp):
                xi, pp = xp
                y, _ = mod.apply({"params": pp, "batch_stats": vs["batch_stats"]},
                                 xi, mutable=["batch_stats"])
                return jnp.sum(nn.relu(y).astype(jnp.float32))
            v, g = jax.value_and_grad(f)((xx, p))
            return v * 1e-12 + jnp.sum(g[0].astype(jnp.float32)) * 1e-12
        fn = jax.jit(fn)
        ms, fixed = slope_fit(fn, (x64, vs["params"]))

    elif args.variant == "pool":
        from ssdx.model import _max_pool

        def fn(c, x):
            xx = x + (c * 1e-30).astype(x.dtype)
            v, g = jax.value_and_grad(
                lambda xi: jnp.sum(_max_pool(xi).astype(jnp.float32)))(xx)
            return v * 1e-12 + jnp.sum(g.astype(jnp.float32)) * 1e-12
        fn = jax.jit(fn)
        ms, fixed = slope_fit(fn, (x64,))

    elif args.variant == "stem":
        from flax import linen as nn

        from ssdx.model import ConvBNRelu, _max_pool

        m1 = ConvBNRelu(64, dtype=dt)
        m2 = ConvBNRelu(64, dtype=dt)
        v1 = m1.init(jax.random.key(0), x3, train=False)
        v2 = m2.init(jax.random.key(1), x64, train=False)

        def fn(c, x, p1, p2):
            xx = x + (c * 1e-30).astype(x.dtype)
            def f(ps):
                pa, pb = ps
                y, _ = m1.apply({"params": pa, "batch_stats": v1["batch_stats"]},
                                xx, train=True, mutable=["batch_stats"])
                y, _ = m2.apply({"params": pb, "batch_stats": v2["batch_stats"]},
                                y, train=True, mutable=["batch_stats"])
                return jnp.sum(_max_pool(y).astype(jnp.float32))
            v, g = jax.value_and_grad(f)((p1, p2))
            acc = sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(g))
            return v * 1e-12 + acc * 1e-12
        fn = jax.jit(fn)
        ms, fixed = slope_fit(fn, (x3, v1["params"], v2["params"]))

    if args.variant == "stem_fused":
        # Full stem fwd+bwd with the fused BN+ReLU+pool tail (compare: "stem").
        from flax import linen as nn

        from ssdx.model import ConvBNRelu
        from ssdx.ops.fused_bn_pool import bn_relu_pool

        m1 = ConvBNRelu(64, dtype=dt)
        v1 = m1.init(jax.random.key(0), x3, train=False)
        conv2 = nn.Conv(64, (3, 3), padding="SAME", dtype=dt,
                        param_dtype=jnp.float32)
        v2 = conv2.init(jax.random.key(1), x64)
        gamma = jnp.asarray(rng.normal(1, 0.2, 64).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.2, 64).astype(np.float32))

        def fn(c, x, p1, p2, g, b):
            xx = x + (c * 1e-30).astype(x.dtype)
            def f(ps):
                pa, pb, gg, bb = ps
                y, _ = m1.apply({"params": pa, "batch_stats": v1["batch_stats"]},
                                xx, train=True, mutable=["batch_stats"])
                y = conv2.apply({"params": pb}, y)
                pl_, mean, var = bn_relu_pool(y, gg, bb, 1e-5, False, True)
                return (jnp.sum(pl_.astype(jnp.float32))
                        + jnp.sum(mean) * 1e-3 + jnp.sum(var) * 1e-3)
            v, gr = jax.value_and_grad(f)((p1, p2, g, b))
            acc = sum(t.astype(jnp.float32).sum() for t in jax.tree.leaves(gr))
            return v * 1e-12 + acc * 1e-12
        fn = jax.jit(fn)
        ms, fixed = slope_fit(fn, (x3, v1["params"], v2["params"], gamma, beta))

    print(f"stem_train[{args.variant}]: {ms:7.3f} ms/iter (fixed {fixed:.1f} ms) bs={B}")


if __name__ == "__main__":
    main()
