#!/usr/bin/env python
"""All postprocess variants timed back-to-back in ONE process so they share
transport conditions (cross-process run variance on the tunneled device was
measured at +/-40%).  Chained + materialized + slope-fit per variant.

Variants measured (bs=32, thresholds 0.2/0.3/100):
  softmax   — softmax + per-prior max only (lower bound on stage-1 input work)
  stage1    — + top_k(P=8732 -> Kp=200)
  stage12   — + gather + top_k(1000 -> 400)   [current stage-1/2 chain]
  logit12   — logit-space ranking key (max_fg - lse, no full softmax)
              + same two top_ks + tiny softmax on the Kp winners
  full_xla  — current default full postprocess (XLA fixpoint NMS)
  full_pal  — full postprocess with the Pallas NMS kernel
  logit_pal — logit-space selection + Pallas NMS (the proposed new default)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ssdx import boxes as BX
from ssdx import priors as P
from ssdx.model import IMAGE_SIZE
from ssdx.nms import batched_nms_mask

B, Kp, n_fg, K = 32, 200, 5, 400
priors = None  # set in main


def select_softmax(conf_all):
    scores_all = jax.nn.softmax(conf_all, axis=-1)[..., 1:]
    return jnp.max(scores_all, axis=-1), scores_all


def stage12_softmax(conf_all):
    best, scores_all = select_softmax(conf_all)
    _, prior_sel = jax.lax.top_k(best, Kp)
    pair = jnp.take_along_axis(scores_all, prior_sel[..., None], axis=1)
    top_scores, pair_idx = jax.lax.top_k(pair.reshape(B, -1), K)
    cls_idx = (pair_idx % n_fg).astype(jnp.int32)
    prior_idx = jnp.take_along_axis(prior_sel, pair_idx // n_fg, axis=1)
    return top_scores, cls_idx, prior_idx


def stage12_logit(conf_all):
    # log softmax is monotone per prior: rank priors by max_fg_logit - lse
    key = jnp.max(conf_all[..., 1:], axis=-1) - jax.nn.logsumexp(conf_all, -1)
    _, prior_sel = jax.lax.top_k(key, Kp)
    sel = jnp.take_along_axis(conf_all, prior_sel[..., None], axis=1)  # [B,Kp,C]
    pair = jax.nn.softmax(sel, axis=-1)[..., 1:]
    top_scores, pair_idx = jax.lax.top_k(pair.reshape(B, -1), K)
    cls_idx = (pair_idx % n_fg).astype(jnp.int32)
    prior_idx = jnp.take_along_axis(prior_sel, pair_idx // n_fg, axis=1)
    return top_scores, cls_idx, prior_idx


def finish(loc_all, top_scores, cls_idx, prior_idx, backend):
    valid = top_scores > 0.2
    pri = priors[prior_idx]
    dec = BX.decode(jnp.take_along_axis(loc_all, prior_idx[..., None], axis=1),
                    pri, (0.1, 0.2))
    xyxy = jnp.clip(BX.cxcywh_to_xyxy(dec), 0.0, 1.0) * IMAGE_SIZE
    keep = batched_nms_mask(xyxy, top_scores, valid, cls_idx, 0.3,
                            class_aware=True, backend=backend)
    kept = jnp.where(keep & valid, top_scores, -1.0)
    final_scores, _ = jax.lax.top_k(kept, 100)
    return final_scores


def make(variant):
    def run(loc, conf):
        loc, conf = jax.lax.optimization_barrier((loc, conf))
        if variant == "softmax":
            best, _ = select_softmax(conf)
            return best
        if variant == "stage1":
            best, _ = select_softmax(conf)
            v, _ = jax.lax.top_k(best, Kp)
            return v
        if variant == "stage12":
            s, _, _ = stage12_softmax(conf)
            return s
        if variant == "logit12":
            s, _, _ = stage12_logit(conf)
            return s
        if variant == "full_xla":
            return finish(loc, *stage12_softmax(conf), "xla")
        if variant == "full_pal":
            return finish(loc, *stage12_softmax(conf), "pallas")
        if variant == "logit_pal":
            return finish(loc, *stage12_logit(conf), "pallas")
        raise ValueError(variant)

    @jax.jit
    def timed(loc, conf, chain):
        conf = conf + (chain * 1e-30).astype(conf.dtype)
        return jnp.sum(run(loc, conf), dtype=jnp.float32)

    return timed


def main():
    global priors
    priors = jnp.asarray(P.create_priors())
    rng = np.random.default_rng(time.time_ns() % (2**31))
    ns = (2, 6, 12, 20)
    mk = lambda: (
        jnp.asarray(rng.normal(0, 0.3, (B, 8732, 4)), jnp.float32),
        jnp.asarray(rng.normal(0, 2.0, (B, 8732, 6)), jnp.float32),
    )
    data = [mk() for _ in range(max(ns) + 1)]

    variants = ["softmax", "stage1", "stage12", "logit12",
                "full_xla", "full_pal", "logit_pal"]
    fns = {v: make(v) for v in variants}
    # compile everything first
    for v in variants:
        c = fns[v](*data[-1], jnp.float32(0.0))
        float(fns[v](*data[-2], c))

    # equivalence: logit selection must match softmax selection exactly
    s_a = fns["full_pal"](*data[0], jnp.float32(0.0))
    s_b = fns["logit_pal"](*data[0], jnp.float32(0.0))
    drift = abs(float(s_a) - float(s_b))

    for rep in range(5):
        out = []
        for v in variants:
            totals = []
            for n in ns:
                s = jnp.float32(0.0)
                t0 = time.perf_counter()
                for loc, conf in data[:n]:
                    s = fns[v](loc, conf, s)
                float(s)
                totals.append(time.perf_counter() - t0)
            a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
            slope, _ = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
            out.append(f"{v}={slope*1e3:.2f}ms")
        print(f"rep{rep}: " + "  ".join(out))
    print(f"logit vs softmax selection score-sum drift: {drift:.2e}")


if __name__ == "__main__":
    main()
