"""Benchmark suite: the five BASELINE.json configs.

Each benchmark prints one JSON line {"metric", "value", "unit", ...}.

  1. single   — SSD300 single-image inference + DIoU NMS on CPU
                (the demo-app serving path)
  2. batched  — batched SSD300 inference bs=32 with prior decode +
                per-class NMS (the headline metric; also repo-root bench.py)
  3. augment  — the fused augmentation pipeline (zoom-out/IoU-crop/resize +
                photometric), bs=16, device-side
  4. train    — SSD300 train step bs=16: matching + multibox loss + hard
                negative mining + backward + SGD update
  5. e2e      — full end-to-end training throughput over a real data dir
                (requires --data-dir pointing at a preprocessed train dir)

Usage: ``python benchmarks/run.py [single|batched|augment|train|e2e|all]``
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _timeit(fn, n_short=8, n_long=24):
    """Trustworthy timing on the tunneled device transport.

    ``fn(i, chain)`` must return a float32 scalar (device array) that
    depends on this iteration's real output AND on ``chain`` (fold it in as
    ``x + (chain * 1e-30)`` — numerically invisible, but NOT constant-
    foldable; an exact *0 gets DCE'd and un-serializes the stream), and
    must consume distinct inputs per ``i``.

    Protocol (each piece is load-bearing; all three failure modes were
    observed on this environment):
      * the chain forces real serial device execution (the transport
        otherwise overlaps/elides pipelined dispatch streams);
      * ``float(chain)`` materializes on host — block_until_ready can
        signal before the device has actually executed;
      * two chain lengths are differenced to remove the fixed ~46 ms
        tunnel round-trip: total(n) = RPC + n*T.
    """
    import jax.numpy as jnp

    # Warm up BOTH signatures: the first call (plain host scalar chain) and
    # a second call whose chain was produced on device — under a mesh the
    # produced scalar carries a NamedSharding, which is a different jit cache
    # key; without this the first timed run pays that recompile and the
    # two-length differencing goes negative.
    c = fn(0, jnp.float32(0.0))
    float(fn(1, c))
    totals = []
    for n in (n_short, n_long):
        chain = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(n):
            chain = fn(i, chain)
        float(chain)
        totals.append(time.perf_counter() - t0)
    return (totals[1] - totals[0]) / (n_long - n_short)


def _model_and_priors(dtype=None, fold_bn=False):
    import jax
    import jax.numpy as jnp

    from ssdx import priors as P
    from ssdx.model import SSD300

    model = SSD300(num_classes=6, dtype=dtype or jnp.bfloat16)
    variables = model.init_variables(jax.random.key(0), batch_size=1)
    if fold_bn:
        from ssdx.export import fold_batchnorm

        model = SSD300(num_classes=6, dtype=dtype or jnp.bfloat16, fold_bn=True)
        variables = fold_batchnorm(variables)
    pri = P.create_priors()
    return model, variables, jnp.asarray(pri), jnp.asarray(P.priors_xyxy(pri))


def bench_single() -> dict:
    """Config 1: single-image latency on CPU (serving path)."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        import jax.numpy as jnp

        from ssdx.predict import postprocess

        # serving path: BN-folded, like Detector.from_weights
        model, variables, priors, _ = _model_and_priors(dtype=jnp.float32, fold_bn=True)

        @jax.jit
        def infer(variables, images):
            loc, conf = model.apply(variables, images, train=False)
            return postprocess(loc, conf, priors, score_thresh=0.2,
                               nms_thresh=0.3, max_per_img=100)

        rng = np.random.default_rng(time.time_ns() % (2**31))
        imgs = [jnp.asarray(rng.normal(0, 1, (1, 300, 300, 3)).astype(np.float32))
                for _ in range(24)]

        def one(i, chain):
            det = infer(variables, imgs[i % 24] + (chain * 1e-30))
            return jnp.sum(det.scores, dtype=jnp.float32)

        dt = _timeit(one, n_short=4, n_long=12)
    return {"metric": "ssd300_single_image_cpu_latency", "value": round(dt * 1e3, 2),
            "unit": "ms"}


def bench_batched(batch_size: int = 32, fold_bn: bool = True,
                  stem_kernel: bool | None = None,
                  use_mesh: bool = False, int8: bool = False) -> dict:
    """Config 2: batched inference + decode + per-class NMS.

    Runs the serving configuration: BatchNorm folded into conv weights and
    (on TPU backends) the fused Pallas stem kernel — what
    Detector.from_weights defaults to on TPU and what bench.py measures.

    ``use_mesh``: shard the batch over a data-parallel mesh of ALL attached
    devices (shard_map forward, GSPMD postprocess — the ssdx/api.py
    Detector(mesh=...) path); ``batch_size`` becomes the GLOBAL batch
    (per-device share = batch_size / n_devices) and the report carries both
    aggregate and per-device throughput.

    ``int8``: quantize the post-stem backbone to int8 (ssdx/quant.py — the
    Detector.quantize_int8 serving mode; stem + heads stay bf16).  On TPU
    this runs the Pallas int8 conv backend (ssdx/ops/pallas_int8_conv.py),
    which routes int8 GEMMs to the MXU; plain XLA would lower them to
    ~1000x-slower scalar VPU code (ssdx/quant.py docstring).
    """
    import jax
    import jax.numpy as jnp

    from ssdx.model import SSD300
    from ssdx.ops.pallas_stem import stem_conv_pool
    from ssdx.predict import postprocess

    if stem_kernel is None:
        # r4 note: the Pallas stem custom call inside shard_map stalled on
        # the tunneled (axon) transport.  Re-bisected in r5
        # (scripts/repro_shardmap_pallas.py): Pallas kernels inside
        # shard_map — elementwise, tiled matmul, and the production stem —
        # all run correctly now, and this mesh path measures 1,975 img/s
        # with the stem kernel (vs ~2,010 unmeshed); the stall does not
        # reproduce on the current toolchain, so mesh mode gets the stem
        # kernel by default again.
        stem_kernel = fold_bn and jax.default_backend() in ("tpu", "axon")
    model, variables, priors, _ = _model_and_priors(fold_bn=fold_bn)
    if stem_kernel:
        model = SSD300(num_classes=6, dtype=jnp.bfloat16, fold_bn=True,
                       stem_input=True)

    qp = None
    if int8:
        if not fold_bn:
            raise ValueError("--int8 requires the folded-BN serving config")
        from ssdx import quant

        calib = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (8, 300, 300, 3)).astype(np.float32))
        if stem_kernel:
            feats = stem_conv_pool(calib.astype(jnp.bfloat16),
                                   variables["params"])
        else:
            feats = quant.stem_bf16(variables["params"], calib)
        scales = quant.calibrate_act_scales(variables["params"], feats)
        qp = quant.quantize_ssd(variables["params"], scales, 6)

    def fwd(variables, images):
        if stem_kernel:
            feats = stem_conv_pool(images.astype(jnp.bfloat16),
                                   variables["params"])
        elif qp is not None:
            from ssdx import quant as q

            feats = q.stem_bf16(variables["params"], images)
        if qp is not None:
            if jax.default_backend() in ("tpu", "axon"):
                from ssdx.ops.pallas_int8_conv import apply_int8_pallas

                return apply_int8_pallas(qp, feats, jnp.bfloat16)
            from ssdx import quant as q

            return q.apply_int8(qp, feats, jnp.bfloat16)
        if stem_kernel:
            return model.apply(variables, feats, train=False)
        loc, conf = model.apply(variables, images, train=False)
        return loc, conf

    n_dev = 1
    in_sharding = None
    if use_mesh:
        from jax.sharding import PartitionSpec as PS

        from ssdx.mesh import DATA_AXIS, batch_sharding, create_mesh, replicated

        mesh = create_mesh()
        n_dev = mesh.devices.size
        batch_size = max(n_dev, batch_size - batch_size % n_dev)
        fwd = jax.shard_map(fwd, mesh=mesh, in_specs=(PS(), PS(DATA_AXIS)),
                            out_specs=PS(DATA_AXIS), check_vma=False)
        variables = jax.device_put(variables, replicated(mesh))
        in_sharding = batch_sharding(mesh)

    @jax.jit
    def infer(variables, images):
        loc, conf = fwd(variables, images)
        return postprocess(loc, conf, priors, score_thresh=0.2,
                           nms_thresh=0.3, max_per_img=100)

    rng = np.random.default_rng(time.time_ns() % (2**31))
    batches = [
        jnp.asarray(rng.normal(0, 1, (batch_size, 300, 300, 3)).astype(np.float32))
        for _ in range(32)
    ]
    if in_sharding is not None:
        batches = [jax.device_put(b, in_sharding) for b in batches]

    def one(i, chain):
        det = infer(variables, batches[i % 32] + (chain * 1e-30))
        return jnp.sum(det.scores, dtype=jnp.float32)

    dt = _timeit(one)
    out = {"metric": f"ssd300_batched_inference_bs{batch_size}"
           + ("_int8" if int8 else ""),
           "value": round(batch_size / dt, 2), "unit": "images/sec"}
    if use_mesh:
        out["metric"] += f"_mesh{n_dev}"
        out["n_devices"] = n_dev
        out["per_device_images_per_sec"] = round(batch_size / dt / n_dev, 2)
    return out


def bench_augment(batch_size: int = 16) -> dict:
    """Config 3: fused augmentation chain on device."""
    import jax
    import jax.numpy as jnp

    from ssdx.data.augment import AugmentConfig, augment_batch

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (batch_size, 512, 512, 3), np.uint8))
    lo = rng.uniform(0, 300, (batch_size, 16, 2)).astype(np.float32)
    sz = rng.uniform(20, 150, (batch_size, 16, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([lo, np.minimum(lo + sz, 512)], -1))
    labels = jnp.asarray(rng.integers(0, 5, (batch_size, 16)).astype(np.int32))
    valid = jnp.asarray(np.ones((batch_size, 16), bool))
    cfg = AugmentConfig()
    keys = jax.random.split(jax.random.key(time.time_ns() % (2**31)), 64)
    imgs_f = imgs.astype(jnp.float32)

    def one(i, chain):
        out_imgs, _, _, _ = augment_batch(
            keys[i % 64], (imgs_f + chain * 1e-30).astype(jnp.uint8),
            boxes, labels, valid, cfg)
        return jnp.sum(out_imgs[:, 0, 0, :], dtype=jnp.float32)

    dt = _timeit(one)
    return {"metric": f"augment_pipeline_bs{batch_size}",
            "value": round(batch_size / dt, 2), "unit": "images/sec"}


def bench_train(batch_size: int = 16) -> dict:
    """Config 4: full train step (matching + loss + backward + update)."""
    import jax
    import jax.numpy as jnp

    from ssdx.train.schedule import build_optimizer
    from ssdx.train.step import Batch, create_train_state, make_train_step

    model, _, priors, priors_xyxy = _model_and_priors()
    tx, _ = build_optimizer(steps_per_epoch=100)
    state = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(model, tx, priors, priors_xyxy, iou_thresh=0.4)

    rng = np.random.default_rng(0)
    lo = rng.uniform(0.1, 0.6, (batch_size, 16, 2)).astype(np.float32)
    sz = rng.uniform(0.05, 0.3, (batch_size, 16, 2)).astype(np.float32)
    batch = Batch(
        images=jnp.asarray(rng.normal(0, 1, (batch_size, 300, 300, 3)).astype(np.float32)),
        gt_boxes=jnp.asarray(np.concatenate([lo, np.minimum(lo + sz, 1.0)], -1)),
        gt_labels=jnp.asarray(rng.integers(0, 5, (batch_size, 16)).astype(np.int32)),
        gt_valid=jnp.asarray(np.ones((batch_size, 16), bool)),
    )

    # thread BOTH the train state and the timing chain through each step
    holder = {"state": state}

    def one(_i, chain):
        b = batch._replace(
            images=batch.images + (chain * 1e-30).astype(batch.images.dtype))
        holder["state"], metrics = step(holder["state"], b)
        return metrics["loss"].astype(jnp.float32)

    dt = _timeit(one, n_short=6, n_long=18)
    return {"metric": f"ssd300_train_step_bs{batch_size}",
            "value": round(batch_size / dt, 2), "unit": "images/sec"}


def bench_e2e(data_dir: str, epochs: int = 1) -> dict:
    """Config 5: end-to-end training throughput on a real dataset dir."""
    import dataclasses

    from ssdx.config import Config
    from ssdx.data.dataset import DetectionDataset
    from ssdx.train.run import run

    ds = DetectionDataset(data_dir)
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, train_dir=data_dir),
        train=dataclasses.replace(cfg.train, save_dir="/tmp/ssdx_bench_ckpt"),
    )
    t0 = time.perf_counter()
    run(cfg, epochs=epochs, resume=False, log=lambda s: None)
    dt = time.perf_counter() - t0
    return {"metric": "e2e_training_epoch", "value": round(dt, 2),
            "unit": f"sec/epoch ({len(ds)} images)"}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("which", nargs="?", default="all",
                    choices=["single", "batched", "augment", "train", "e2e", "all"])
    ap.add_argument("--data-dir", help="required for e2e")
    ap.add_argument("--mesh", action="store_true",
                    help="batched config: shard over all attached devices")
    ap.add_argument("--int8", action="store_true",
                    help="batched: int8-quantized backbone (ssdx/quant.py)")
    ap.add_argument("--batch-size", type=int, default=32,
                    help="batched config: global batch size")
    args = ap.parse_args(argv)

    runs = []
    if args.which in ("single", "all"):
        runs.append(bench_single)
    if args.which in ("batched", "all"):
        runs.append(lambda: bench_batched(batch_size=args.batch_size,
                                          use_mesh=args.mesh, int8=args.int8))
    if args.which in ("augment", "all"):
        runs.append(bench_augment)
    if args.which in ("train", "all"):
        runs.append(bench_train)
    if args.which == "e2e":
        if not args.data_dir:
            raise SystemExit("e2e requires --data-dir")
        runs.append(lambda: bench_e2e(args.data_dir))

    for fn in runs:
        print(json.dumps(fn()))


if __name__ == "__main__":
    main()
