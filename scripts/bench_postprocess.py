#!/usr/bin/env python
"""Postprocess-only benchmark: exact lax.top_k vs TPU-optimized
approx_max_k for the two candidate-selection stages.

Fresh-process, chained + materialized + slope-fit protocol
(scripts/bench_stem_one.py). Also reports result drift of the approx
variants vs the exact baseline on the same inputs.

Usage: python scripts/bench_postprocess.py {exact|approx1|approx12} [--bs 32]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["exact", "approx1", "approx12"])
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--recall", type=float, default=0.99)
    args = ap.parse_args()
    B = args.bs

    import ssdx.predict as sp
    from ssdx import priors as P

    priors = jnp.asarray(P.create_priors())

    real_top_k = jax.lax.top_k

    def make_post(variant):
        calls = {"n": 0}

        def hybrid_top_k(x, k):
            # stage-1 selection ([B, 8732] -> Kp) is call #1 inside
            # postprocess; stage-2 ([B, Kp*n_fg] -> K) is call #2; the
            # final max_per_img top_k stays exact in all variants (it
            # orders the output).
            calls["n"] += 1
            use_approx = (variant == "approx1" and calls["n"] == 1) or (
                variant == "approx12" and calls["n"] <= 2
            )
            if use_approx:
                return jax.lax.approx_max_k(x, k, recall_target=args.recall)
            return real_top_k(x, k)

        @jax.jit
        def post(loc, conf, chain):
            calls["n"] = 0
            conf = conf + (chain * 1e-30).astype(conf.dtype)
            jax.lax.top_k = hybrid_top_k
            try:
                det = sp.postprocess(
                    loc, conf, priors, score_thresh=0.2, nms_thresh=0.3,
                    max_per_img=100,
                )
            finally:
                jax.lax.top_k = real_top_k
            return det, jnp.sum(det.scores, dtype=jnp.float32)

        return post

    post = make_post(args.variant)

    rng = np.random.default_rng(time.time_ns() % (2**31))
    ns = (2, 4, 8, 16, 24)
    mk = lambda: (
        jnp.asarray(rng.normal(0, 0.3, (B, 8732, 4)), jnp.float32),
        jnp.asarray(rng.normal(0, 2.0, (B, 8732, 6)), jnp.float32),
    )
    data = [mk() for _ in range(max(ns) + 1)]
    det, s = post(*data[-1], jnp.float32(0.0))
    float(s)

    totals = []
    for n in ns:
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for loc, conf in data[:n]:
            det, s = post(loc, conf, s)
        float(s)
        totals.append(time.perf_counter() - t0)
    a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
    slope, icept = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
    print(f"postprocess {args.variant}: {slope*1e3:7.3f} ms/iter "
          f"(fixed {icept*1e3:.1f} ms) bs={B}")

    # drift check vs exact on one fixed input
    if args.variant != "exact":
        loc, conf = data[0]
        det_v, _ = post(loc, conf, jnp.float32(0.0))
        det_e, _ = make_post("exact")(loc, conf, jnp.float32(0.0))
        kept_v = int(np.asarray(det_v.valid).sum())
        kept_e = int(np.asarray(det_e.valid).sum())
        diff = np.abs(np.asarray(det_v.boxes) - np.asarray(det_e.boxes)).max()
        print(f"kept boxes {kept_v} vs exact {kept_e}; max box diff {diff:.3f}")


if __name__ == "__main__":
    main()
