#!/usr/bin/env python
"""Train-step stage timing at bs=16 (chained + materialized + slope-fit,
fresh process per variant — see scripts/bench_stem_one.py for why).

Variants:
  fwd       — train-mode forward only (BN batch stats mutable)
  targets   — build_targets alone (CIoU matching + encode)
  loss      — forward + targets + multibox loss (no backward)
  grad      — value_and_grad of the loss (fwd + bwd)
  step      — the full jitted train step (grad + SGD update + BN stats)

Usage: PYTHONPATH=... python scripts/bench_train_stages.py VARIANT [--bs 16]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["fwd", "targets", "loss", "grad", "update", "step"])
    ap.add_argument("--bs", type=int, default=16)
    args = ap.parse_args()
    B = args.bs

    from ssdx import priors as P
    from ssdx.losses import multibox_loss
    from ssdx.matching import build_targets
    from ssdx.model import SSD300
    from ssdx.train.schedule import build_optimizer
    from ssdx.train.step import Batch, create_train_state, make_train_step

    model = SSD300(num_classes=6, dtype=jnp.bfloat16)
    pri = P.create_priors()
    priors = jnp.asarray(pri)
    priors_xyxy = jnp.asarray(P.priors_xyxy(pri))
    tx, _ = build_optimizer(steps_per_epoch=100)
    state = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(model, tx, priors, priors_xyxy, iou_thresh=0.4)

    rng = np.random.default_rng(0)
    G = 16
    lo = rng.uniform(0.1, 0.6, (B, G, 2)).astype(np.float32)
    sz = rng.uniform(0.05, 0.3, (B, G, 2)).astype(np.float32)
    batch = Batch(
        images=jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)).astype(np.float32)),
        gt_boxes=jnp.asarray(np.concatenate([lo, np.minimum(lo + sz, 1.0)], -1)),
        gt_labels=jnp.asarray(rng.integers(0, 5, (B, G)).astype(np.int32)),
        gt_valid=jnp.asarray(np.ones((B, G), bool)),
    )

    def loss_fn(params, batch_stats, b):
        (loc, cls), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            b.images, train=True, mutable=["batch_stats"],
        )
        tg = build_targets(b.gt_boxes, b.gt_labels, b.gt_valid,
                           priors, priors_xyxy, 0.4)
        total, loc_l, conf_l = multibox_loss(loc, cls, tg.loc, tg.cls, tg.pos, 3.0)
        return total, (loc_l, conf_l)

    variant = args.variant
    holder = {"state": state}

    if variant == "fwd":
        @jax.jit
        def fn(s, b, chain):
            b = b._replace(images=b.images + (chain * 1e-30).astype(b.images.dtype))
            (loc, cls), _ = model.apply(
                {"params": s.params, "batch_stats": s.batch_stats},
                b.images, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(loc[..., 0].astype(jnp.float32)) + jnp.sum(
                cls[..., 0].astype(jnp.float32))
    elif variant == "targets":
        @jax.jit
        def fn(s, b, chain):
            b = b._replace(gt_boxes=b.gt_boxes + (chain * 1e-30))
            tg = build_targets(b.gt_boxes, b.gt_labels, b.gt_valid,
                               priors, priors_xyxy, 0.4)
            return jnp.sum(tg.loc, dtype=jnp.float32) + jnp.sum(
                tg.pos.astype(jnp.float32))
    elif variant == "loss":
        @jax.jit
        def fn(s, b, chain):
            b = b._replace(images=b.images + (chain * 1e-30).astype(b.images.dtype))
            total, _ = loss_fn(s.params, s.batch_stats, b)
            return total.astype(jnp.float32)
    elif variant == "grad":
        @jax.jit
        def fn(s, b, chain):
            b = b._replace(images=b.images + (chain * 1e-30).astype(b.images.dtype))
            (total, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(s.params, s.batch_stats, b)
            # consume EVERY grad leaf — a single-leaf consumer lets XLA
            # dead-code-eliminate most of the backward pass
            acc = sum(g.astype(jnp.float32).sum() for g in jax.tree.leaves(grads))
            return total.astype(jnp.float32) + acc * 1e-12
    elif variant == "update":
        tx2, _ = build_optimizer(steps_per_epoch=100)

        @jax.jit
        def fn(s, b, chain):
            import optax

            grads = jax.tree.map(
                lambda p: p + (chain * 1e-30).astype(p.dtype), s.params)
            updates, new_opt = tx2.update(grads, s.opt_state, s.params)
            new_params = optax.apply_updates(s.params, updates)
            return sum(
                u.astype(jnp.float32).sum() for u in jax.tree.leaves(new_params)
            ) * 1e-12
    elif variant == "step":
        def fn(_s, b, chain):
            b = b._replace(images=b.images + (chain * 1e-30).astype(b.images.dtype))
            holder["state"], metrics = step(holder["state"], b)
            return metrics["loss"].astype(jnp.float32)

    ns = (2, 4, 8, 16)
    c = fn(state, batch, jnp.float32(0.0))
    float(fn(state, batch, c))

    totals = []
    for n in ns:
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(state, batch, s)
        float(s)
        totals.append(time.perf_counter() - t0)
    a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
    slope, icept = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
    print(f"train[{variant}]: {slope*1e3:7.3f} ms/iter "
          f"(fixed {icept*1e3:.1f} ms) bs={B} -> {B/slope:.1f} img/s")


if __name__ == "__main__":
    main()
