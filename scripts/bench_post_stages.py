#!/usr/bin/env python
"""Postprocess stage-by-stage device timing at bs=32 (chained slope-fit
protocol, scripts/bench_postprocess.py).

Variants:
  stage12   — softmax + two-stage top-k candidate selection only
  decode    — + prior gather/decode/clip
  nms_xla   — full postprocess, XLA fixpoint NMS (the default)
  nms_pallas— full postprocess, Pallas masked-scan NMS kernel
  logitsel  — full postprocess with the logit-space stage-1 selection

Usage: PYTHONPATH=.:... python scripts/bench_post_stages.py VARIANT [--bs 32]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=[
        "stage12", "decode", "nms_xla", "nms_pallas"])
    ap.add_argument("--bs", type=int, default=32)
    args = ap.parse_args()
    B = args.bs

    from ssdx import boxes as BX
    from ssdx import priors as P
    from ssdx.model import IMAGE_SIZE
    from ssdx.nms import batched_nms_mask
    from ssdx.predict import postprocess

    priors = jnp.asarray(P.create_priors())

    def stages(loc_all, conf_all, upto: str, nms_backend: str = "xla"):
        Kp, n_fg = 200, 5
        K = 400
        loc_all, conf_all = jax.lax.optimization_barrier((loc_all, conf_all))
        scores_all = jax.nn.softmax(conf_all, axis=-1)[..., 1:]
        _, prior_sel = jax.lax.top_k(jnp.max(scores_all, axis=-1), Kp)
        pair_scores = jnp.take_along_axis(scores_all, prior_sel[..., None], axis=1)
        top_scores, pair_idx = jax.lax.top_k(pair_scores.reshape(B, -1), K)
        cls_idx = (pair_idx % n_fg).astype(jnp.int32)
        prior_idx = jnp.take_along_axis(prior_sel, pair_idx // n_fg, axis=1)
        valid = top_scores > 0.2
        if upto == "stage12":
            return top_scores, valid
        pri = priors[prior_idx]
        dec = BX.decode(jnp.take_along_axis(loc_all, prior_idx[..., None], axis=1),
                        pri, (0.1, 0.2))
        xyxy = jnp.clip(BX.cxcywh_to_xyxy(dec), 0.0, 1.0) * IMAGE_SIZE
        if upto == "decode":
            return xyxy.sum(-1), valid
        keep = batched_nms_mask(xyxy, top_scores, valid, cls_idx, 0.3,
                                class_aware=True, backend=nms_backend)
        kept_scores = jnp.where(keep & valid, top_scores, -1.0)
        final_scores, sel = jax.lax.top_k(kept_scores, 100)
        return final_scores, final_scores > 0

    if args.variant in ("stage12", "decode"):
        fn = lambda l, c: stages(l, c, args.variant)
    elif args.variant == "nms_xla":
        fn = lambda l, c: postprocess(l, c, priors, score_thresh=0.2,
                                      nms_thresh=0.3, max_per_img=100)[1:3]
    elif args.variant == "nms_pallas":
        fn = lambda l, c: postprocess(l, c, priors, score_thresh=0.2,
                                      nms_thresh=0.3, max_per_img=100,
                                      nms_backend="pallas")[1:3]

    @jax.jit
    def run(loc, conf, chain):
        conf = conf + (chain * 1e-30).astype(conf.dtype)
        s, _ = fn(loc, conf)
        return jnp.sum(s, dtype=jnp.float32)

    rng = np.random.default_rng(time.time_ns() % (2**31))
    ns = (2, 4, 8, 16, 24)
    mk = lambda: (
        jnp.asarray(rng.normal(0, 0.3, (B, 8732, 4)), jnp.float32),
        jnp.asarray(rng.normal(0, 2.0, (B, 8732, 6)), jnp.float32),
    )
    data = [mk() for _ in range(max(ns) + 1)]
    c = run(*data[-1], jnp.float32(0.0))
    float(run(*data[-2], c))

    totals = []
    for n in ns:
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for loc, conf in data[:n]:
            s = run(loc, conf, s)
        float(s)
        totals.append(time.perf_counter() - t0)
    a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
    slope, icept = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
    print(f"post[{args.variant}]: {slope*1e3:7.3f} ms/iter "
          f"(fixed {icept*1e3:.1f} ms) bs={B}")


if __name__ == "__main__":
    main()
