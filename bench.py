"""Headline benchmark: batched SSD300 inference throughput (bs=32) on the
default backend (TPU when available), including prior decode + per-class
DIoU-NMS postprocessing (BASELINE config 2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.  The
BASELINE.json north-star target is 5,000 img/s on a v5e-8 (8 chips);
vs_baseline compares this run's per-chip throughput against the per-chip
share of that target (5000 / 8 = 625 img/s per chip), scaled by the number
of devices actually attached.
"""
from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssdx import priors as P
    from ssdx.export import fold_batchnorm
    from ssdx.model import SSD300
    from ssdx.predict import postprocess

    batch_size = 32
    # Serving configuration: BatchNorm folded into the conv weights (what
    # Detector.from_weights(..., fold_bn=True) runs) — same math as eval-mode
    # BN with the elementwise passes removed.
    base = SSD300(num_classes=6, dtype=jnp.bfloat16)
    variables = fold_batchnorm(base.init_variables(jax.random.key(0), batch_size=1))
    model = SSD300(num_classes=6, dtype=jnp.bfloat16, fold_bn=True)
    priors = jnp.asarray(P.create_priors())

    @jax.jit
    def infer(variables, images):
        loc, conf = model.apply(variables, images, train=False)
        return postprocess(
            loc, conf, priors, score_thresh=0.2, nms_thresh=0.3, max_per_img=100
        )

    # Pre-stage DISTINCT input batches: repeated identical dispatches can be
    # cached/elided by the device transport, inflating throughput.
    rng = np.random.default_rng(0)
    n_iters = 30
    batches = [
        jnp.asarray(rng.normal(0, 1, (batch_size, 300, 300, 3)).astype(np.float32))
        for _ in range(n_iters)
    ]

    # warmup / compile
    det = infer(variables, batches[0])
    det.valid.block_until_ready()

    t0 = time.perf_counter()
    for images in batches:
        det = infer(variables, images)
    det.valid.block_until_ready()
    dt = time.perf_counter() - t0

    images_per_sec = batch_size * n_iters / dt
    target = 5000.0 * len(jax.devices()) / 8.0  # per-attached-chip share
    print(
        json.dumps(
            {
                "metric": "ssd300_batched_inference_bs32_images_per_sec",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / target, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
