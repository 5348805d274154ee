#!/usr/bin/env python
"""Per-layer and whole-backbone timing of the Pallas int8 conv backend
(ssdx/ops/pallas_int8_conv.py) against the bf16 XLA convs it replaces.

Per layer: one int8_conv at the layer's production shape vs the same conv
as an XLA bf16 lax.conv (the serving baseline).  Whole backbone: the
apply_int8_pallas post-stem walk (incl. pools, tap requantization, heads)
vs the bf16 equivalent.  All timings use the chained + materialized +
slope-fit protocol (README "Measurement protocol").

Usage: python scripts/bench_int8_conv.py [--bs 32] [--layers]
"""
from __future__ import annotations

import argparse
import functools
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

from ssdx import quant
from ssdx.ops.pallas_int8_conv import _layer_pad, apply_int8_pallas, int8_conv

# (name, H, cin, cout, stride, dilation, pad): every distinct FLOP-mass
# (H, cin, cout) in quant._TOPOLOGY (extras <1% of FLOPs are omitted).
SHAPES = [
    ("conv2_1", 150, 64, 128, 1, 1, 1),
    ("conv2_2", 150, 128, 128, 1, 1, 1),
    ("conv3_1", 75, 128, 256, 1, 1, 1),
    ("conv3_x", 75, 256, 256, 1, 1, 1),
    ("conv4_1", 38, 256, 512, 1, 1, 1),
    ("conv4_x", 38, 512, 512, 1, 1, 1),
    ("conv5_x", 19, 512, 512, 1, 1, 1),
    ("conv6_d6", 19, 512, 1024, 1, 6, 6),
    ("conv7_1x1", 19, 1024, 1024, 1, 1, 0),
]


def _time_loop(body, arg, iters=(8, 40), reps=2):
    """Per-iteration time of ``body(carry, arg) -> carry`` via an ON-DEVICE
    ``lax.fori_loop``: the tunneled transport adds heavy-tailed multi-ms
    noise per dispatch, so host-side chaining mis-ranks sub-ms kernels
    (negative difference estimates were observed); one dispatch running the
    whole chain amortizes that noise across 10-100 ms of device work.  The
    (n2-n1)-iteration difference cancels the dispatch + argument-transfer
    fixed cost; min over ``reps`` rejects stragglers."""
    import jax.lax as lax

    n1, n2 = iters
    fns = {}
    for n in iters:
        fns[n] = jax.jit(functools.partial(
            lambda n, c, x: lax.fori_loop(0, n, lambda i, t: body(t, x), c), n))
        float(fns[n](jnp.float32(0.0), arg))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        ts = []
        for n in iters:
            t0 = time.perf_counter()
            float(fns[n](jnp.float32(0.0), arg))
            ts.append(time.perf_counter() - t0)
        best = min(best, (ts[1] - ts[0]) / (n2 - n1))
    return best


def bench_layers(bs: int):
    rng = np.random.default_rng(0)
    for name, H, cin, cout, s, d, p in SHAPES:
        k = 1 if "1x1" in name else 3
        xq = jnp.asarray(rng.integers(-127, 128, (bs, H, H, cin)).astype(np.int8))
        kq = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)).astype(np.int8))
        ws = jnp.asarray(rng.uniform(1e-3, 2e-3, cout).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, cout).astype(np.float32))
        ns = jnp.asarray(rng.uniform(0.01, 0.05, cout).astype(np.float32))
        xbf = (xq.astype(jnp.float32) / 127).astype(jnp.bfloat16)
        kbf = (kq.astype(jnp.float32) / 127).astype(jnp.bfloat16)
        spec = quant._L(name, (k, k), s, "SAME" if p == d and k == 3 else ((p, p), (p, p)), d, None, None)
        Ho = (H + 2 * p - 2 * d - 1) // s + 1 if k == 3 else H
        flops = 2 * bs * Ho * Ho * k * k * cin * cout

        # Each iteration depends on the previous through a runtime-zero
        # scalar added to the input, so the stream cannot reorder/overlap.
        def bodyi(t, x, kq=kq, ws=ws, b=b, ns=ns, s=s, d=d, p=p):
            xi = x + jnp.clip(t, -1, 1).astype(jnp.int8)
            y = int8_conv(xi, kq, ws, b, ns, stride=s, dilation=d, pad=p, emit="int8")
            return jnp.sum(y.astype(jnp.float32)) * 1e-30

        def bodyb(t, x, kbf=kbf, b=b, spec=spec):
            xi = x + t.astype(jnp.bfloat16)
            y = quant._conv(xi, kbf, spec, jnp.bfloat16)
            y = jax.nn.relu(y + b.astype(jnp.bfloat16))
            return jnp.sum(y.astype(jnp.float32)) * 1e-30

        ti = _time_loop(bodyi, xq)
        tb = _time_loop(bodyb, xbf)
        print(
            f"{name:12s} [{bs},{H},{H},{cin}]->{cout}: "
            f"int8 {ti*1e3:7.3f} ms ({flops/ti/1e12:6.1f} TF/s)  "
            f"bf16 {tb*1e3:7.3f} ms ({flops/tb/1e12:6.1f} TF/s)  "
            f"ratio {tb/ti:5.2f}x",
            flush=True,
        )


def sweep(bs: int, inner: int = 8):
    """Grid-search (cnb, bh) per production layer shape; prints the winner
    rows for the _pick_cnb/_pick_bh tables."""
    import math

    rng = np.random.default_rng(0)
    for name, H, cin, cout, s, d, p in SHAPES:
        if "1x1" in name:
            continue
        xq = jnp.asarray(rng.integers(-127, 128, (bs, H, H, cin)).astype(np.int8))
        kq = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)).astype(np.int8))
        ws = jnp.asarray(rng.uniform(1e-3, 2e-3, cout).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, cout).astype(np.float32))
        ns = jnp.asarray(rng.uniform(0.01, 0.05, cout).astype(np.float32))
        Wp = -(-(H + 2 * p) // 8) * 8
        Ho = H + 2 * p - 2 * d
        flops = 2 * bs * Ho * Ho * 9 * cin * cout
        best = None
        seen = set()
        for cnb in (128, 256, 512):
            if cout % cnb:
                continue
            for cap in (8, 16, 24, 38, 64):
                bh = Ho if cap >= Ho else math.ceil(Ho / math.ceil(Ho / cap))
                if (cnb, bh) in seen:
                    continue
                seen.add((cnb, bh))
                M = bh * Wp
                vmem = M * 9 * cin + 9 * cin * cnb + M * cnb * 9 + 4 * M * cin
                if vmem > 12_000_000:
                    continue

                def bodyi(t, x, kq=kq, ws=ws, b=b, ns=ns, cnb=cnb, bh=bh):
                    xi = x + jnp.clip(t, -1, 1).astype(jnp.int8)
                    y = int8_conv(xi, kq, ws, b, ns, stride=s, dilation=d,
                                  pad=p, emit="int8", cnb=cnb, bh=bh)
                    return jnp.sum(y.astype(jnp.float32)) * 1e-30

                try:
                    ti = _time_loop(bodyi, xq)
                except Exception as e:
                    print(f"  {name} cnb={cnb} bh={bh}: FAIL {type(e).__name__}", flush=True)
                    continue
                tag = f"cnb={cnb:3d} bh={bh:3d}"
                print(f"  {name:10s} {tag}: {ti*1e3:7.3f} ms ({flops/ti/1e12:6.1f} TF/s)", flush=True)
                if best is None or ti < best[0]:
                    best = (ti, cnb, bh)
        print(f"BEST {name:10s} (H={H},cin={cin},cout={cout}): cnb={best[1]} bh={best[2]} "
              f"{best[0]*1e3:.3f} ms ({flops/best[0]/1e12:.1f} TF/s)", flush=True)


def _load_qp(bs: int):
    from pathlib import Path

    import ssdx.serve.app as app_mod
    from ssdx.api import Detector
    from ssdx.serve.app import CLASS_TO_IDX

    bundled = Path(app_mod.__file__).parent / "demo_weights.npz"
    det = Detector.from_weights(bundled, CLASS_TO_IDX, fold_bn=True)
    params = det.variables["params"]
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.normal(0, 1, (bs, 150, 150, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    scales = quant.calibrate_act_scales(params, feats)
    qp = quant.quantize_ssd(params, scales, det.num_classes)
    return qp, params, feats


def bench_stages(bs: int):
    """Where does the walk time go?  Times the int8 backbone with the head
    convs replaced by tap sums (backbone-only) and the 12 bf16 head convs
    alone on precomputed taps (heads-only), plus pool-free variants."""
    qp, params, feats = _load_qp(bs)

    # backbone-only: monkeypatch-free — reimplement the walk minus heads by
    # calling apply_int8_pallas's building blocks directly.
    from ssdx.ops.pallas_int8_conv import _layer_pad
    from ssdx.quant import _TOPOLOGY, _max_pool, _quantize_act

    def walk(f, with_pools=True):
        taps = [None] * 6
        xq = _quantize_act(f.astype(jnp.float32), qp.layers[_TOPOLOGY[0].name].in_scale)
        for i, spec in enumerate(_TOPOLOGY):
            ql = qp.layers[spec.name]
            nxt = _TOPOLOGY[i + 1] if i + 1 < len(_TOPOLOGY) else None
            kw = dict(stride=spec.stride, dilation=spec.dilation, pad=_layer_pad(spec))
            if spec.tap is not None and nxt is not None:
                xq, tap = int8_conv(xq, ql.kernel_q, ql.w_scale, ql.bias,
                                    qp.layers[nxt.name].in_scale, emit="both",
                                    tap_dtype=jnp.bfloat16, **kw)
                taps[spec.tap] = tap
            elif nxt is None:
                taps[spec.tap] = int8_conv(xq, ql.kernel_q, ql.w_scale, ql.bias,
                                           emit="f32", tap_dtype=jnp.bfloat16, **kw)
            else:
                xq = int8_conv(xq, ql.kernel_q, ql.w_scale, ql.bias,
                               qp.layers[nxt.name].in_scale, emit="int8", **kw)
            if spec.pool and nxt is not None and with_pools:
                xq = _max_pool(xq, ceil=spec.pool == "ceil")
        return taps

    def body_backbone(t, f):
        taps = walk(f + (t * 1e-30).astype(f.dtype))
        return sum(jnp.sum(x.astype(jnp.float32)) for x in taps) * 1e-9

    taps0 = jax.jit(walk)(feats)
    head_spec = quant._L("head", (3, 3), 1, "SAME", 1, None, None)

    def body_heads(t, taps):
        tot = jnp.float32(0.0)
        for i, tap in enumerate(taps):
            x = tap + (t * 1e-30).astype(tap.dtype)
            for h in ("box_head_", "cls_head_"):
                hp = qp.heads[f"{h}{i}"]
                y = quant._conv(x, hp["kernel"].astype(jnp.bfloat16), head_spec, jnp.bfloat16)
                tot += jnp.sum(y + hp["bias"].astype(jnp.bfloat16), dtype=jnp.float32)
        return tot * 1e-9

    def body_heads_fused(t, taps):
        # loc+cls kernels concatenated on cout: ONE conv per tap.
        tot = jnp.float32(0.0)
        for i, tap in enumerate(taps):
            x = tap + (t * 1e-30).astype(tap.dtype)
            kl = qp.heads[f"box_head_{i}"]["kernel"].astype(jnp.bfloat16)
            kc = qp.heads[f"cls_head_{i}"]["kernel"].astype(jnp.bfloat16)
            kcat = jnp.concatenate([kl, kc], axis=-1)
            y = quant._conv(x, kcat, head_spec, jnp.bfloat16)
            tot += jnp.sum(y, dtype=jnp.float32)
        return tot * 1e-9

    tb = _time_loop(body_backbone, feats)
    th = _time_loop(body_heads, taps0)
    tf = _time_loop(body_heads_fused, taps0)
    print(f"int8 backbone-only  bs={bs}: {tb*1e3:6.2f} ms", flush=True)
    print(f"bf16 heads-only     bs={bs}: {th*1e3:6.2f} ms", flush=True)
    print(f"bf16 heads fused    bs={bs}: {tf*1e3:6.2f} ms  (loc+cls one conv/tap)", flush=True)


def bench_walk_prefix(bs: int):
    """In-walk per-layer deltas: time the int8 walk truncated after each
    layer; consecutive differences are the honest in-program cost of layer i
    (+ its pool), directly comparable to the isolated --layers numbers to
    expose glue."""
    qp, params, feats = _load_qp(bs)
    from ssdx.ops.pallas_int8_conv import _layer_pad
    from ssdx.quant import _TOPOLOGY, _max_pool, _quantize_act

    def walk_upto(f, n):
        taps = [None] * 6
        xq = _quantize_act(f.astype(jnp.float32), qp.layers[_TOPOLOGY[0].name].in_scale)
        for i, spec in enumerate(_TOPOLOGY[:n]):
            ql = qp.layers[spec.name]
            nxt = _TOPOLOGY[i + 1] if i + 1 < len(_TOPOLOGY) else None
            kw = dict(stride=spec.stride, dilation=spec.dilation, pad=_layer_pad(spec))
            if spec.tap is not None and nxt is not None:
                xq, tap = int8_conv(xq, ql.kernel_q, ql.w_scale, ql.bias,
                                    qp.layers[nxt.name].in_scale, emit="both",
                                    tap_dtype=jnp.bfloat16, **kw)
                taps[spec.tap] = tap
            elif nxt is None:
                taps[spec.tap] = int8_conv(xq, ql.kernel_q, ql.w_scale, ql.bias,
                                           emit="f32", tap_dtype=jnp.bfloat16, **kw)
            else:
                xq = int8_conv(xq, ql.kernel_q, ql.w_scale, ql.bias,
                               qp.layers[nxt.name].in_scale, emit="int8", **kw)
            if spec.pool and nxt is not None:
                xq = _max_pool(xq, ceil=spec.pool == "ceil")
        tot = jnp.sum(xq.astype(jnp.float32)) * 1e-9
        for t in taps:
            if t is not None:
                tot += jnp.sum(t.astype(jnp.float32)) * 1e-9
        return tot

    prev = 0.0
    for n in range(0, len(_TOPOLOGY) + 1):
        def body(t, f, n=n):
            return walk_upto(f + (t * 1e-30).astype(f.dtype), n)

        tn = _time_loop(body, feats)
        name = _TOPOLOGY[n - 1].name if n else "(quantize_act)"
        print(f"prefix {n:2d} {name:14s}: {tn*1e3:7.3f} ms   delta {max(tn-prev,0)*1e3:6.3f} ms",
              flush=True)
        prev = tn


def bench_backbone(bs: int):
    qp, params, feats = _load_qp(bs)

    @jax.jit
    def step_i8(c, f):
        loc, cls = apply_int8_pallas(qp, f + (c * 1e-30).astype(f.dtype))
        return jnp.sum(loc) * 1e-9 + jnp.sum(cls) * 1e-9

    # bf16 control: the same topology walk in bf16 (conv + bias + relu +
    # pools + the same head convs), i.e. what the serving model runs.
    bf = {
        spec.name: (
            jnp.asarray(params[spec.name]["Conv_0"]["kernel"], jnp.bfloat16),
            jnp.asarray(params[spec.name]["Conv_0"]["bias"], jnp.bfloat16),
        )
        for spec in quant._TOPOLOGY
    }

    @jax.jit
    def step_bf(c, f):
        x = f + (c * 1e-30).astype(jnp.bfloat16)
        taps = [None] * 6
        for spec in quant._TOPOLOGY:
            k, b = bf[spec.name]
            x = quant._conv(x, k, spec, jnp.bfloat16)
            x = jax.nn.relu(x + b)
            if spec.tap is not None:
                taps[spec.tap] = x
            if spec.pool:
                x = quant._max_pool(x, ceil=spec.pool == "ceil")
        tot = jnp.float32(0.0)
        head_spec = quant._L("head", (3, 3), 1, "SAME", 1, None, None)
        for i, t in enumerate(taps):
            for h in ("box_head_", "cls_head_"):
                hp = qp.heads[f"{h}{i}"]
                y = quant._conv(t, hp["kernel"].astype(jnp.bfloat16), head_spec, jnp.bfloat16)
                tot += jnp.sum(y + hp["bias"].astype(jnp.bfloat16), dtype=jnp.float32)
        return tot * 1e-9

    ti = _time_loop(step_i8, feats)
    tb = _time_loop(step_bf, feats)
    print(f"post-stem backbone+heads bs={bs}: int8 {ti*1e3:.2f} ms   "
          f"bf16 {tb*1e3:.2f} ms   ratio {tb/ti:.2f}x", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--layers", action="store_true")
    ap.add_argument("--backbone", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--prefix", action="store_true")
    args = ap.parse_args()
    if args.prefix:
        bench_walk_prefix(args.bs)
        return
    if args.sweep:
        sweep(args.bs)
        return
    if args.stages:
        bench_stages(args.bs)
        return
    if args.layers or not args.backbone:
        bench_layers(args.bs)
    if args.backbone or not args.layers:
        bench_backbone(args.bs)


if __name__ == "__main__":
    main()
