"""TPU vs CPU numerical parity check for every jitted compute component.

The TPU transport backend in this environment is experimental and has been
observed to miscompile at least one fused gather pattern (see
ssdx/data/augment.py::_sample_iou_crop).  This script runs each component on
the TPU and on the host CPU with identical inputs and compares outputs, so
silent numerical corruption is caught component by component.

Usage: python scripts/tpu_parity_check.py
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

FAILURES = []


def check(name, fn, args, tol=1e-4):
    cpu = jax.devices("cpu")[0]
    tpu_dev = jax.devices()[0]
    with jax.default_device(cpu):
        ref = fn(*jax.tree.map(lambda x: jax.device_put(x, cpu), args))
    with jax.default_device(tpu_dev):
        got = fn(*jax.tree.map(lambda x: jax.device_put(x, tpu_dev), args))
    ref_l = jax.tree.leaves(ref)
    got_l = jax.tree.leaves(got)
    ok = True
    worst = 0.0
    for r, g in zip(ref_l, got_l):
        r = np.asarray(r, np.float32)
        g = np.asarray(g, np.float32)
        if r.shape != g.shape:
            ok = False
            break
        d = float(np.max(np.abs(r - g))) if r.size else 0.0
        worst = max(worst, d)
        if not np.allclose(r, g, atol=tol, rtol=tol):
            ok = False
    status = "OK " if ok else "FAIL"
    print(f"{status} {name:32s} max|diff|={worst:.3e}")
    if not ok:
        FAILURES.append(name)


def main() -> None:
    from ssdx import priors as P
    from ssdx.data.augment import AugmentConfig, augment_batch, preprocess_batch
    from ssdx.losses import multibox_loss
    from ssdx.matching import build_targets
    from ssdx.model import SSD300
    from ssdx.predict import postprocess

    rng = np.random.default_rng(0)
    pri = P.create_priors()
    priors = jnp.asarray(pri)
    priors_xyxy = jnp.asarray(P.priors_xyxy(pri))
    B, G = 4, 6

    # shared synthetic data
    imgs_u8 = rng.integers(0, 255, (B, 128, 128, 3), np.uint8)
    lo = rng.uniform(5, 70, (B, G, 2)).astype(np.float32)
    sz = rng.uniform(20, 50, (B, G, 2)).astype(np.float32)
    bx_px = np.concatenate([lo, np.minimum(lo + sz, 128)], -1).astype(np.float32)
    lb = rng.integers(0, 5, (B, G)).astype(np.int32)
    vd = np.ones((B, G), bool)
    vd[:, 4:] = False
    bx01 = bx_px / 128.0

    key = jax.random.key(7)

    # 1) augmentation (full config incl. crop sampling + photometric)
    cfg = AugmentConfig(zoom_out_prob=0.3)
    check("augment_batch(full cfg)",
          lambda k, i, b, l, v: augment_batch(k, i, b, l, v, cfg),
          (key, jnp.asarray(imgs_u8), jnp.asarray(bx_px), jnp.asarray(lb),
           jnp.asarray(vd)), tol=2e-2)
    check("preprocess_batch",
          preprocess_batch, (jnp.asarray(imgs_u8), jnp.asarray(bx_px)), tol=2e-2)

    # 2) matching
    check("build_targets",
          lambda b, l, v: build_targets(b, l, v, priors, priors_xyxy, 0.4),
          (jnp.asarray(bx01), jnp.asarray(lb), jnp.asarray(vd)), tol=1e-3)

    # 3) loss
    loc_p = rng.normal(0, 1, (B, 8732, 4)).astype(np.float32)
    cls_p = rng.normal(0, 1, (B, 8732, 6)).astype(np.float32)
    tg_cpu = build_targets(jnp.asarray(bx01), jnp.asarray(lb), jnp.asarray(vd),
                           priors, priors_xyxy, 0.4)
    check("multibox_loss",
          lambda lp, cp, lt, ct, pm: multibox_loss(lp, cp, lt, ct, pm),
          (jnp.asarray(loc_p), jnp.asarray(cls_p), tg_cpu.loc, tg_cpu.cls,
           tg_cpu.pos), tol=1e-3)

    # 4) postprocess (both NMS backends)
    conf = rng.normal(0, 0.2, (B, 8732, 6)).astype(np.float32)
    conf[..., 0] += 4.0
    for b in range(B):
        for p in rng.choice(8732, 12, replace=False):
            conf[b, p, rng.integers(1, 6)] += 10.0
    loc_small = rng.normal(0, 0.2, (B, 8732, 4)).astype(np.float32)
    check("postprocess(xla nms)",
          lambda l, c: postprocess(l, c, priors, score_thresh=0.2,
                                   nms_thresh=0.3, max_per_img=50),
          (jnp.asarray(loc_small), jnp.asarray(conf)), tol=1e-2)

    def post_pallas(l, c):
        on_cpu = l.devices() <= set(jax.devices("cpu"))
        backend = "pallas_interpret" if on_cpu else "pallas"
        return postprocess(l, c, priors, score_thresh=0.2, nms_thresh=0.3,
                           max_per_img=50, nms_backend=backend)

    check("postprocess(pallas nms)", post_pallas,
          (jnp.asarray(loc_small), jnp.asarray(conf)), tol=1e-2)

    # 5) model forward (f32).  TPU convs default to bf16 multiplies with f32
    # accumulation, so a true correctness check must force full precision.
    model = SSD300(num_classes=6, dtype=jnp.float32)
    variables = model.init_variables(jax.random.key(0))
    x = rng.normal(0, 1, (2, 300, 300, 3)).astype(np.float32)

    def fwd_highest(v, xx):
        with jax.default_matmul_precision("highest"):
            return model.apply(v, xx, train=False)

    check("model forward f32 (highest)", fwd_highest,
          (variables, jnp.asarray(x)), tol=5e-3)

    # 6) full train step (optional: slow compile), f32 + highest precision
    if "--full" in sys.argv:
        from ssdx.train.schedule import build_optimizer
        from ssdx.train.step import Batch, create_train_state, make_train_step

        tx, _ = build_optimizer(steps_per_epoch=10, warmup_epochs=0,
                                base_lr=1e-3)
        state0 = create_train_state(model, tx, jax.random.key(0))
        step = make_train_step(model, tx, priors, priors_xyxy, iou_thresh=0.4)
        imgs = rng.normal(0, 1, (4, 300, 300, 3)).astype(np.float32)
        batch = Batch(
            images=jnp.asarray(imgs),
            gt_boxes=jnp.asarray(bx01),
            gt_labels=jnp.asarray(lb),
            gt_valid=jnp.asarray(vd),
        )

        def one_step(s, b):
            with jax.default_matmul_precision("highest"):
                new_state, metrics = step(s, b)
            return metrics, new_state.params

        check("train step f32 (highest)", one_step, (state0, batch), tol=1e-2)

    print()
    if FAILURES:
        print(f"PARITY FAILURES: {FAILURES}")
        sys.exit(1)
    print("ALL COMPONENTS MATCH CPU")


if __name__ == "__main__":
    main()
