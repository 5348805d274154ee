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
import os
import sys
import time

# Pin the CPU ISA so persistently cached XLA:CPU executables (from the
# CPU-side init below) are reloadable on any host (same rationale as
# tests/conftest.py).  Must be set before first jax import.
if "xla_cpu_max_isa" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX2"
    ).strip()

def main(stem_kernel: bool | None = None) -> None:
    import jax

    # Persistent XLA/Mosaic compile cache (same pattern as tests/conftest.py).
    # NOTE: must go through jax.config.update — on jax 0.9.0 the
    # JAX_COMPILATION_CACHE_DIR env var is silently ignored
    # (config.optional_string_state does not read the environment).  The
    # fused-stem + fused-head + Pallas-NMS program costs minutes of cold
    # compile; with the cache warm (we pre-warm it during the round by
    # running this script) a fresh ``python bench.py`` completes in well
    # under the driver's capture window.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ssdx_bench"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from ssdx import priors as P
    from ssdx.export import fold_batchnorm
    from ssdx.model import SSD300
    from ssdx.ops.pallas_stem import stem_conv_pool
    from ssdx.predict import postprocess

    if stem_kernel is None:
        stem_kernel = "--no-stem-kernel" not in sys.argv

    batch_size = 32
    # Serving configuration: BatchNorm folded into the conv weights (what
    # Detector.from_weights(..., fold_bn=True) runs) — same math as eval-mode
    # BN with the elementwise passes removed — plus the fused Pallas stem
    # kernel (conv1 block + maxpool; ssdx/ops/pallas_stem.py) unless
    # --no-stem-kernel is passed.
    #
    # Init + BN-fold run EAGERLY on the CPU backend, then transfer once:
    # running them on the attached chip dispatches hundreds of tiny eager ops
    # over the tunneled transport (~46 ms RTT each) — measured 150+ s of the
    # old wall time, and another 150 s hidden in warmup blocking on those
    # in-flight results.  On CPU the same work is < 2 s.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        base = SSD300(num_classes=6, dtype=jnp.bfloat16)
        variables = fold_batchnorm(
            base.init_variables(jax.random.key(0), batch_size=1)
        )
    variables = jax.device_put(variables, jax.devices()[0])
    jax.block_until_ready(variables)
    model = SSD300(
        num_classes=6, dtype=jnp.bfloat16, fold_bn=True, stem_input=stem_kernel
    )
    priors = jnp.asarray(P.create_priors())

    @jax.jit
    def infer(variables, images, chain):
        # ``chain`` is the previous dispatch's output scalar, scaled to
        # numerical invisibility (1e-30; an exact *0 would be DCE'd): a
        # device-side dependency chain that forces real serial execution.
        # The tunneled transport was observed both caching repeated
        # (program, args) dispatches AND intermittently reporting
        # impossible sub-ms times for pipelined dispatch streams.
        images = images + (chain * 1e-30).astype(images.dtype)
        if stem_kernel:
            images = stem_conv_pool(images, variables["params"])
        loc, conf = model.apply(variables, images, train=False)
        det = postprocess(
            loc, conf, priors, score_thresh=0.2, nms_thresh=0.3, max_per_img=100
        )
        return det, jnp.sum(det.scores, dtype=jnp.float32)

    # Pre-stage DISTINCT input batches (salted per run): repeated identical
    # dispatches can be cached/elided by the device transport.
    rng = np.random.default_rng(time.time_ns() % (2**31))
    n_iters = 30
    batches = [
        jnp.asarray(rng.normal(0, 1, (batch_size, 300, 300, 3)).astype(np.float32))
        for _ in range(n_iters + 1)
    ]

    # warmup / compile (with host materialization — see timing note below)
    det, chain = infer(variables, batches[-1], jnp.float32(0.0))
    float(chain)

    def run(n: int) -> float:
        """Total wall time for an n-long chained run, forced to completion.

        block_until_ready can signal before the device has executed on this
        transport, so the chained scalar is materialized on host; the fixed
        ~46 ms tunnel round-trip is removed by differencing two chain
        lengths (total(n) = RPC + n*T).
        """
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for images in batches[:n]:
            det, c = infer(variables, images, c)
        float(c)
        return time.perf_counter() - t0

    # The tunneled transport has tens-of-ms RPC jitter, which can exceed a
    # single short chain's compute time; take the min of repeated runs of
    # each chain length before differencing.
    n_small = n_iters // 3
    t_small = min(run(n_small) for _ in range(3))
    t_full = min(run(n_iters) for _ in range(3))
    per_iter = (t_full - t_small) / (n_iters - n_small)

    images_per_sec = batch_size / per_iter
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
