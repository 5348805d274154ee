#!/usr/bin/env python
"""Interleaved same-process A/B: eq-mask pool backward vs XLA SelectAndScatter
inside the FULL bs=16 train grad program.

Cross-process runs drift by >1 ms over minutes on the tunneled transport, so
both variants are compiled in one process and slope-fit in alternating order
(A B A B ...), which cancels drift.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_pool_bwd.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def build_grad_fn(eqmask: bool):
    import ssdx.model as M
    from flax import linen as nn

    if eqmask:
        pool = M._pool2x2
    else:
        def pool(x):
            return nn.max_pool(x, (2, 2), strides=(2, 2))

    orig = M._pool2x2
    M._pool2x2 = pool  # swap for trace time only
    try:
        from ssdx import priors as P
        from ssdx.losses import multibox_loss
        from ssdx.matching import build_targets

        model = M.SSD300(num_classes=6, dtype=jnp.bfloat16)
        variables = model.init_variables(jax.random.key(0), batch_size=1)
        priors = jnp.asarray(P.create_priors())
        from ssdx.boxes import cxcywh_to_xyxy

        priors_xyxy = cxcywh_to_xyxy(priors)

        B, G = 16, 8
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)).astype(np.float32))
        gtb = jnp.asarray(np.sort(rng.uniform(0, 1, (B, G, 2, 2)), axis=2)
                          .transpose(0, 1, 3, 2).reshape(B, G, 4).astype(np.float32))
        gtl = jnp.asarray(rng.integers(0, 5, (B, G)).astype(np.int32))
        gtv = jnp.asarray(np.ones((B, G), bool))

        def loss_fn(params, stats, images):
            (loc, cls), mut = model.apply(
                {"params": params, "batch_stats": stats}, images,
                train=True, mutable=["batch_stats"])
            tg = build_targets(gtb, gtl, gtv, priors, priors_xyxy, 0.4)
            total, *_ = multibox_loss(loc, cls, tg.loc, tg.cls, tg.pos, 3.0)
            return total

        @jax.jit
        def fn(c, params, stats):
            images = imgs + (c * 1e-30).astype(imgs.dtype)
            v, g = jax.value_and_grad(loss_fn)(params, stats, images)
            acc = sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(g))
            return v + acc * 1e-12

        # force trace now while the monkeypatch is active
        p, s = variables["params"], variables["batch_stats"]
        c = fn(jnp.float32(0.0), p, s)
        float(fn(c, p, s))
        return fn, p, s
    finally:
        M._pool2x2 = orig


def slope(fn, p, s, ns=(2, 4, 8)):
    totals = []
    for n in ns:
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = fn(acc, p, s)
        float(acc)
        totals.append(time.perf_counter() - t0)
    a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
    m, _ = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
    return m * 1e3


def main():
    fa, pa, sa = build_grad_fn(eqmask=True)
    fb, pb, sb = build_grad_fn(eqmask=False)
    res = {"eqmask": [], "xla": []}
    for _ in range(4):
        res["eqmask"].append(slope(fa, pa, sa))
        res["xla"].append(slope(fb, pb, sb))
    for k, v in res.items():
        print(f"{k:7s}: " + " ".join(f"{x:6.2f}" for x in v) +
              f"  median {np.median(v):6.2f} ms")


if __name__ == "__main__":
    main()
