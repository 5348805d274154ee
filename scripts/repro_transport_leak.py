#!/usr/bin/env python
"""Minimal repro: host-RSS growth per dispatch on the tunneled transport.

During the r5 SynthDrive run the training process leaked ~16 MB of host
RSS per train-step dispatch (one staged input batch per step; 14 epochs x
585 steps -> 130 GB RSS -> OOM kill).  The training loop and input
pipeline hold no references — this script shows the leak with nothing but
device_put + a jitted reduction in a loop, measuring RSS via
/proc/self/statm every N iterations.

Expected on a healthy backend: flat RSS after warmup.  Observed on the
tunneled (axon) transport: RSS grows by ~the per-iteration device_put
payload.

Measured (r5, 150 iters of a 12.6 MB payload): growth is EXACTLY the
payload — 12.58-12.60 MB/iter, every run.  Variants tried (all leak at
the same rate): explicit ``jax.device_put``; numpy passed directly to
the jitted call; ``jnp.asarray``; and a single reused host buffer
mutated in place (whose transfers do carry the fresh content — the
retained copy is an internal per-transfer staging allocation, not a
buffer-identity cache).  Conclusion: no user-side workaround exists;
bound per-process dispatch counts (chunked training via the auto-resume
path, which ssdx's checkpointing makes lossless) until the transport is
fixed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/repro_transport_leak.py [--iters 200]
"""
from __future__ import annotations

import argparse
import gc
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

PAGE = os.sysconf("SC_PAGE_SIZE")


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * PAGE / 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--mb-per-iter", type=float, default=12.6,
                    help="payload size (default = one [16,512,512,3] uint8 "
                    "training batch)")
    args = ap.parse_args()

    shape = (16, 512, 512, 3)  # 12.6 MB uint8, the training batch shape
    rng = np.random.default_rng(0)

    @jax.jit
    def step(x, c):
        # a real dependency so the dispatch cannot be elided
        y = jnp.sum(x.astype(jnp.float32)) * 1e-30 + c
        return y

    print(f"backend={jax.default_backend()} payload={np.prod(shape)/1e6:.1f} MB/iter")
    c = jnp.float32(0.0)
    base = None
    t0 = time.perf_counter()
    for i in range(args.iters):
        # distinct host array each iteration (np.empty + fill is cheaper
        # than fresh random but still a distinct buffer/dispatch)
        host = np.empty(shape, np.uint8)
        host[0, 0, 0, :3] = (i, i >> 8, i >> 16)
        x = jax.device_put(host)
        c = step(x, c)
        del x, host
        if i % 25 == 24:
            float(c)  # drain the dispatch stream
            gc.collect()
            r = rss_mb()
            if base is None:
                base = r
            print(f"iter {i + 1:4d}: rss {r:8.1f} MB  (+{r - base:7.1f} MB, "
                  f"{(r - base) / max(i + 1 - 25, 1):5.2f} MB/iter)", flush=True)
    dt = time.perf_counter() - t0
    growth = rss_mb() - (base or 0.0)
    per = growth / max(args.iters - 25, 1)
    print(f"total growth {growth:.1f} MB over {args.iters} iters "
          f"({per:.2f} MB/iter) in {dt:.1f}s")
    if per > 0.2 * args.mb_per_iter:
        print("LEAK: RSS grows with the dispatch count (staged payloads retained)")
    else:
        print("ok: RSS roughly flat")


if __name__ == "__main__":
    main()
