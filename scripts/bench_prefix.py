#!/usr/bin/env python
"""Benchmark a PREFIX of the folded SSD300 forward in a fresh process
(chained + materialized + slope-fit protocol; see bench_stem_one.py).

Prefixes:
  stem    pallas stem kernel only                    -> [B,150,150,64]
  conv2   stem + conv2 block + pool                  -> [B,75,75,128]
  conv3   ... + conv3 block + ceil pool              -> [B,38,38,256]
  conv4   ... + conv4 block (tap4_3)                 -> [B,38,38,512]
  heads   full network fwd (loc, cls), no postprocess
  full    network + postprocess (decode/topk/NMS)

Usage: python scripts/bench_prefix.py conv2 [--bs 32]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prefix", choices=["stem", "conv2", "conv3", "conv4", "heads", "full"])
    ap.add_argument("--bs", type=int, default=32)
    args = ap.parse_args()
    B = args.bs

    from flax import linen as nn

    from ssdx import priors as P
    from ssdx.export import fold_batchnorm
    from ssdx.model import SSD300
    from ssdx.ops.pallas_stem import stem_conv_pool
    from ssdx.predict import postprocess

    base = SSD300(num_classes=6, dtype=jnp.bfloat16)
    variables = fold_batchnorm(base.init_variables(jax.random.key(0), batch_size=1))
    model = SSD300(num_classes=6, dtype=jnp.bfloat16, fold_bn=True, stem_input=True)
    priors = jnp.asarray(P.create_priors())
    params = variables["params"]

    def conv_block(x, names, pool="std"):
        for name in names:
            p = params[name]["Conv_0"]
            y = jax.lax.conv_general_dilated(
                x, jnp.asarray(p["kernel"], x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            x = jnp.maximum(y + jnp.asarray(p["bias"], jnp.float32), 0.0).astype(x.dtype)
        if pool == "std":
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        elif pool == "ceil":
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding=((0, 1), (0, 1)))
        return x

    def forward_prefix(x):
        feats = stem_conv_pool(x, params)
        if args.prefix == "stem":
            return jnp.sum(feats[..., 0], dtype=jnp.float32)
        x = conv_block(feats, ["ConvBNRelu_2", "ConvBNRelu_3"])
        if args.prefix == "conv2":
            return jnp.sum(x[..., 0], dtype=jnp.float32)
        x = conv_block(x, ["ConvBNRelu_4", "ConvBNRelu_5", "ConvBNRelu_6"], pool="ceil")
        if args.prefix == "conv3":
            return jnp.sum(x[..., 0], dtype=jnp.float32)
        x = conv_block(x, ["ConvBNRelu_7", "ConvBNRelu_8", "ConvBNRelu_9"], pool="none")
        if args.prefix == "conv4":
            return jnp.sum(x[..., 0], dtype=jnp.float32)
        loc, conf = model.apply(variables, feats, train=False)
        if args.prefix == "heads":
            return jnp.sum(loc[..., 0], dtype=jnp.float32) + jnp.sum(
                conf[..., 0], dtype=jnp.float32)
        det = postprocess(loc, conf, priors, score_thresh=0.2, nms_thresh=0.3,
                          max_per_img=100)
        return jnp.sum(det.scores, dtype=jnp.float32)

    @jax.jit
    def fn(x, s):
        return forward_prefix(x + (s * 1e-30).astype(x.dtype))

    rng = np.random.default_rng(time.time_ns() % (2**31))
    ns = (2, 4, 8, 16, 24)
    xs = [jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)), jnp.bfloat16)
          for _ in range(max(ns) + 1)]
    float(fn(xs[-1], jnp.float32(0.0)))
    totals = []
    for n in ns:
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for x in xs[:n]:
            s = fn(x, s)
        float(s)
        totals.append(time.perf_counter() - t0)
    a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
    slope, icept = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
    print(f"{args.prefix}: {slope*1e3:7.3f} ms/iter (fixed {icept*1e3:.1f} ms) bs={B}")


if __name__ == "__main__":
    main()
