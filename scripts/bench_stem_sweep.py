#!/usr/bin/env python
"""Diagnostic sweep for the Pallas stem kernel: isolate per-step overhead
(grid size via R), mask cost, and pair-shift cost.

The no-mask / no-shift variants are numerically WRONG at edges — they are
perf probes only.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stem_sweep.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import ssdx.ops.pallas_stem as ps


def bench(fn, inputs, iters=None):
    """EVERY dispatch gets a distinct input: the axon transport serves
    repeated identical dispatches from a cache (ROADMAP r1 note), which
    made a 4-input cycling bench report 0.03 ms for a 7 ms kernel."""
    iters = len(inputs) - 1
    out = fn(inputs[-1])  # warmup/compile on its own input
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(inputs[i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = 32
    # Salt the RNG per run: the device transport caches (program, args)
    # dispatches SERVER-side across processes, so reusing default_rng(0)
    # arrays from a previous script run returns cached results in ~0 ms.
    rng = np.random.default_rng(time.time_ns() % (2**31))
    print(f"devices: {jax.devices()}", flush=True)
    w1 = rng.normal(0, 0.15, (3, 3, 3, 64)).astype(np.float32)
    b1 = rng.normal(0, 0.3, (64,)).astype(np.float32)
    w2 = rng.normal(0, 0.08, (3, 3, 64, 64)).astype(np.float32)
    b2 = rng.normal(0, 0.3, (64,)).astype(np.float32)
    params = {
        "ConvBNRelu_0": {"Conv_0": {"kernel": w1, "bias": b1}},
        "ConvBNRelu_1": {"Conv_0": {"kernel": w2, "bias": b2}},
    }
    xs = [jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)), jnp.bfloat16) for _ in range(13)]

    def run_variant(name, r=None, no_mask=False, no_shift=False):
        old_r = ps._R
        old_k = ps._stem_kernel
        try:
            if r is not None:
                ps._R = r
            if no_mask or no_shift:
                base = old_k

                def patched(main_ref, tail_ref, w1r, b1r, w2r, b2r, out_ref, y1s):
                    # re-implementation with toggles, mirroring _stem_kernel
                    t = jax.experimental.pallas.program_id(1)
                    import jax.experimental.pallas as pl

                    R = ps._R
                    M = R * ps._PP
                    w1v = w1r[:]
                    b1v = b1r[0]

                    def stage1(patches, n, first):
                        y = jax.lax.dot_general(
                            patches, w1v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        y = jnp.maximum(y + b1v[None, :], 0.0)
                        if not no_mask:
                            flat = jax.lax.broadcasted_iota(jnp.int32, (n * ps._PP, 128), 0)
                            lane = jax.lax.broadcasted_iota(jnp.int32, (n * ps._PP, 128), 1)
                            pair = flat % ps._PP
                            colpad = ((pair == 0) & (lane < 64)) | (
                                (pair == ps._PAIRS - 1) & (lane >= 64))
                            row = first + flat // ps._PP
                            y = jnp.where(colpad | (row < 0) | (row >= ps._H), 0.0, y)
                        return y.astype(y1s.dtype)

                    y1s[0:M] = stage1(main_ref[0], R, t * R - 1)
                    y1s[M:M + 2 * ps._PP] = stage1(tail_ref[0], 2, t * R - 1 + R)
                    y1 = y1s[:]
                    y1sh = y1 if no_shift else jnp.concatenate([y1[1:], y1[:1]], axis=0)
                    acc = jnp.zeros((M, 128), jnp.float32)
                    for dr in range(3):
                        for p in range(2):
                            src = y1 if p == 0 else y1sh
                            chunk = src[dr * ps._PP: dr * ps._PP + M]
                            acc = acc + jax.lax.dot_general(
                                chunk, w2r[2 * dr + p], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                    y2 = jnp.maximum(acc + b2r[0][None, :], 0.0)
                    ph = jnp.maximum(y2[:, :64], y2[:, 64:])
                    for k in range(R // 2):
                        a = ph[(2 * k) * ps._PP:(2 * k) * ps._PP + ps._PP]
                        bb = ph[(2 * k + 1) * ps._PP:(2 * k + 1) * ps._PP + ps._PP]
                        out_ref[0, k] = jnp.maximum(a, bb)[: ps._PAIRS - 1].astype(out_ref.dtype)

                ps._stem_kernel = patched
            ps._stem_call.clear_cache()
            fn = jax.jit(lambda x: ps.stem_conv_pool(x, params, interpret=False))
            t = bench(fn, xs)
            print(f"{name}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e).splitlines()[0][:110]}", flush=True)
        finally:
            ps._R = old_r
            ps._stem_kernel = old_k
            ps._stem_call.clear_cache()

    def conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y + b, 0.0).astype(x.dtype)

    def xla_block(x):
        y = conv(conv(x, w1, b1), w2, b2)
        Bx, H, W, C = y.shape
        return y.reshape(Bx, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))

    t = bench(jax.jit(xla_block), xs)
    print(f"XLA block      : {t*1e3:7.3f} ms", flush=True)

    run_variant("R=20 full      ")
    run_variant("R=30 full      ", r=30)
    run_variant("R=50 full      ", r=50)
    run_variant("R=30 no-mask   ", r=30, no_mask=True)
    run_variant("R=30 no-shift  ", r=30, no_shift=True)
    run_variant("R=30 no-both   ", r=30, no_mask=True, no_shift=True)


if __name__ == "__main__":
    main()
