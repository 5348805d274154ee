#!/usr/bin/env python
"""Re-test the postprocess fusion-island barrier (ssdx/predict.py).

Round 1 found that fusing the network forward with the two-stage
top-k/gather postprocess faulted the TPU kernel at bs=16 on this
environment's experimental backend, and worked around it with an
optimization_barrier costing ~7% of inference.  This script re-tests the
fault (run whenever the backend updates): it monkeypatches the barrier
away, runs fwd+postprocess fused at several batch sizes, checks results
against the barrier version, and reports timing for both.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_barrier.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import ssdx.predict as sp
    from ssdx import priors as P
    from ssdx.export import fold_batchnorm
    from ssdx.model import SSD300

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(time.time_ns() % (2**31))

    base = SSD300(num_classes=6, dtype=jnp.bfloat16)
    variables = fold_batchnorm(base.init_variables(jax.random.key(0), batch_size=1))
    model = SSD300(num_classes=6, dtype=jnp.bfloat16, fold_bn=True)
    priors = jnp.asarray(P.create_priors())

    real_barrier = jax.lax.optimization_barrier

    def make_infer():
        @jax.jit
        def infer(variables, images, chain):
            images = images + (chain * 1e-30).astype(images.dtype)
            loc, conf = model.apply(variables, images, train=False)
            det = sp.postprocess(
                loc, conf, priors, score_thresh=0.2, nms_thresh=0.3, max_per_img=100
            )
            return det, jnp.sum(det.scores, dtype=jnp.float32)
        return infer

    for bs in (16, 32):
        xs = [jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 3)), jnp.bfloat16)
              for _ in range(25)]
        results = {}
        for mode in ("barrier", "fused"):
            if mode == "fused":
                jax.lax.optimization_barrier = lambda x: x  # type: ignore
            try:
                infer = make_infer()
                det, c = infer(variables, xs[-1], jnp.float32(0.0))
                float(c)
                results[mode] = jax.tree.map(np.asarray, (det.boxes, det.scores, det.valid))
                # chained + materialized + two-length slope fit (see
                # scripts/bench_stem_one.py for the protocol rationale)
                totals = []
                for n in (8, 24):
                    c = jnp.float32(0.0)
                    t0 = time.perf_counter()
                    for x in xs[:n]:
                        det, c = infer(variables, x, c)
                    float(c)
                    totals.append(time.perf_counter() - t0)
                dt = (totals[1] - totals[0]) / 16
                print(f"bs={bs} {mode}: {dt*1e3:7.3f} ms/iter  ({bs/dt:,.0f} img/s)", flush=True)
            except Exception as e:
                print(f"bs={bs} {mode}: FAIL {str(e).splitlines()[0][:100]}", flush=True)
            finally:
                jax.lax.optimization_barrier = real_barrier
        if "barrier" in results and "fused" in results:
            ok = all(
                np.allclose(a, b, atol=1e-2)
                for a, b in zip(results["barrier"], results["fused"])
            )
            print(f"bs={bs} fused-vs-barrier results match: {ok}", flush=True)


if __name__ == "__main__":
    main()
