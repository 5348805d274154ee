#!/usr/bin/env python
"""Per-block fwd+bwd timing of the TRAIN-mode SSD300 at bs=16.

Rebuilds the backbone out of standalone ConvBNRelu modules driven by the
real SSD300 parameter subtrees (same auto-numbered keys), takes
``value_and_grad`` of a prefix reduction w.r.t. exactly the parameters the
prefix uses (every grad leaf consumed so XLA cannot DCE the backward), and
slope-fits chained iterations (see scripts/bench_stem_one.py for why).
Successive-prefix differences give per-block fwd+bwd cost.

Prefixes (cumulative): stem conv2 conv3 conv4 conv5 conv67 extras heads

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_prefix.py conv3 [--bs 16]
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

PREFIXES = ["stem", "conv2", "conv3", "conv4", "conv5", "conv67", "extras", "heads"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prefix", choices=PREFIXES)
    ap.add_argument("--bs", type=int, default=16)
    args = ap.parse_args()
    B = args.bs

    from flax import linen as nn

    from ssdx.model import SSD300, ConvBNRelu, _max_pool

    dt = jnp.bfloat16
    model = SSD300(num_classes=6, dtype=dt)
    variables = model.init_variables(jax.random.key(0), batch_size=1)
    all_params = variables["params"]
    all_stats = variables["batch_stats"]

    cbr = lambda f, **kw: ConvBNRelu(f, dtype=dt, **kw)
    # (module, key) pairs in SSD300 construction order + pool markers.
    blocks: dict[str, list] = {
        "stem": [(cbr(64), "ConvBNRelu_0"), (cbr(64), "ConvBNRelu_1"), "pool"],
        "conv2": [(cbr(128), "ConvBNRelu_2"), (cbr(128), "ConvBNRelu_3"), "pool"],
        "conv3": [(cbr(256), f"ConvBNRelu_{i}") for i in (4, 5, 6)] + ["cpool"],
        "conv4": [(cbr(512), f"ConvBNRelu_{i}") for i in (7, 8, 9)],
        "conv5": ["pool"] + [(cbr(512), f"ConvBNRelu_{i}") for i in (10, 11, 12)],
        "conv67": [
            (cbr(1024, padding=((6, 6), (6, 6)), dilation=(6, 6)), "ConvBNRelu_13"),
            (cbr(1024, kernel=(1, 1), padding="VALID"), "ConvBNRelu_14"),
        ],
        "extras": [
            (cbr(256, kernel=(1, 1), padding="VALID"), "ConvBNRelu_15"),
            (cbr(512, strides=(2, 2), padding=((1, 1), (1, 1))), "ConvBNRelu_16"),
            (cbr(128, kernel=(1, 1), padding="VALID"), "ConvBNRelu_17"),
            (cbr(256, strides=(2, 2), padding=((1, 1), (1, 1))), "ConvBNRelu_18"),
            (cbr(128, kernel=(1, 1), padding="VALID"), "ConvBNRelu_19"),
            (cbr(256, padding="VALID", use_bn=False), "ConvBNRelu_20"),
            (cbr(128, kernel=(1, 1), padding="VALID", use_bn=False), "ConvBNRelu_21"),
            (cbr(256, padding="VALID", use_bn=False), "ConvBNRelu_22"),
        ],
    }

    upto = PREFIXES.index(args.prefix)
    chain = [s for p in PREFIXES[: upto + 1] if p != "heads" for s in blocks[p]]
    used_keys = [k for s in chain if not isinstance(s, str) for _, k in [s]]
    run_heads = args.prefix == "heads"

    head = lambda f, name: nn.Conv(
        f, (3, 3), padding="SAME", dtype=dt, param_dtype=jnp.float32, name=name
    )
    from ssdx.priors import BOXES_PER_LOCATION

    head_keys = [f"{h}_head_{i}" for i in range(6) for h in ("box", "cls")]
    if run_heads:
        used_keys = used_keys + head_keys

    params = {k: all_params[k] for k in used_keys}
    stats = {k: all_stats[k] for k in used_keys if k in all_stats}

    # Tap points (after these modules' outputs) for the heads, by key.
    tap_after = {"ConvBNRelu_9", "ConvBNRelu_14", "ConvBNRelu_16",
                 "ConvBNRelu_18", "ConvBNRelu_20", "ConvBNRelu_22"}

    def forward(p, s, x):
        taps = []
        mutated = {}
        for step in chain:
            if step == "pool":
                x = _max_pool(x)
            elif step == "cpool":
                x = _max_pool(x, ceil=True)
            else:
                mod, key = step
                vs = {"params": p[key]}
                if key in s:
                    vs["batch_stats"] = s[key]
                    x, mut = mod.apply(vs, x, train=True, mutable=["batch_stats"])
                    mutated[key] = mut
                else:
                    x = mod.apply(vs, x, train=True)
                if key in tap_after:
                    taps.append(x)
        if not run_heads:
            return jnp.sum(x.astype(jnp.float32))
        acc = jnp.float32(0.0)
        for i, (t, k) in enumerate(zip(taps, BOXES_PER_LOCATION)):
            nc = 6
            loc = head(k * 4, f"box_head_{i}").apply(
                {"params": p[f"box_head_{i}"]}, t)
            cls = head(k * nc, f"cls_head_{i}").apply(
                {"params": p[f"cls_head_{i}"]}, t)
            acc = acc + jnp.sum(loc.astype(jnp.float32)) + jnp.sum(
                cls.astype(jnp.float32))
        return acc

    @jax.jit
    def fn(p, s, x, c):
        x = x + (c * 1e-30).astype(x.dtype)
        val, grads = jax.value_and_grad(lambda pp: forward(pp, s, x))(p)
        acc = sum(g.astype(jnp.float32).sum() for g in jax.tree.leaves(grads))
        return val + acc * 1e-12

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)).astype(np.float32))
    ns = (2, 4, 8, 16)
    c = fn(params, stats, x, jnp.float32(0.0))
    float(fn(params, stats, x, c))
    totals = []
    for n in ns:
        s0 = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s0 = fn(params, stats, x, s0)
        float(s0)
        totals.append(time.perf_counter() - t0)
    a = np.vstack([np.asarray(ns, float), np.ones(len(ns))]).T
    slope, icept = np.linalg.lstsq(a, np.asarray(totals), rcond=None)[0]
    print(f"grad_prefix[{args.prefix}]: {slope*1e3:7.3f} ms/iter "
          f"(fixed {icept*1e3:.1f} ms) bs={B}")


if __name__ == "__main__":
    main()
