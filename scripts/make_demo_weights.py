#!/usr/bin/env python
"""Train demo weights for the serving app on the bundled-scene distribution.

The reference app is a working detector out of the box (trained weights,
ssd_demo_app.py:32-36).  Without the Udacity data, the closest honest
equivalent: train the 5-class SSD300 on SynthDrive scenes from
ssdx.data.synth.render_scene — the SAME renderer behind the bundled example
images — until val mAP clears a threshold, then export a weights-only
artifact to saved_models/best.weights.  The app then produces meaningful
boxes on its own /examples gallery (and its model-card banner disappears).

Runs the REAL stack end-to-end: DetectionLoader -> device augmentation ->
jitted DP train step -> evaluate/mAP -> save_params.

Usage: python scripts/make_demo_weights.py [--epochs 60] [--out saved_models/best.weights]
"""
from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def make_dataset(root: Path, n: int, size: int = 512) -> None:
    from ssdx.data.synth import generate_dataset

    # no empty frames: every scene contributes positives for the quick overfit
    generate_dataset(root, n, seed=1000, size=size, empty_frac=0.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--min-map", type=float, default=0.5)
    ap.add_argument("--out", default="saved_models/best.weights")
    ap.add_argument("--bundle", default="ssdx/serve/demo_weights.npz",
                    help="also write a compressed f16 .npz demo bundle "
                         "(the app's no-weights fallback); '' disables")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssdx import priors as P
    from ssdx.data.augment import AugmentConfig
    from ssdx.data.dataset import DetectionDataset
    from ssdx.data.pipeline import DetectionLoader
    from ssdx.mesh import create_mesh
    from ssdx.model import SSD300
    from ssdx.serve.app import CLASS_TO_IDX
    from ssdx.train.checkpoint import save_params
    from ssdx.train.loop import evaluate
    from ssdx.train.schedule import build_optimizer
    from ssdx.train.step import create_train_state, make_eval_step, make_train_step

    tmp = Path(tempfile.mkdtemp(prefix="ssdx_demo_scenes_"))
    make_dataset(tmp, n=args.images, size=args.size)
    ds = DetectionDataset(tmp)
    assert ds.class_to_idx == CLASS_TO_IDX, (
        f"scene classes {ds.class_to_idx} must match the app map {CLASS_TO_IDX}"
    )
    print(f"dataset: {len(ds)} scenes, classes={ds.classes}, "
          f"devices={jax.devices()}")

    mesh = create_mesh()
    # moderate augmentation: crops teach locality, but keep the identity
    # option dominant so the model converges quickly on 64 scenes
    aug = AugmentConfig(small_sampler_options=(0.1, 2.0, 2.0),
                        large_sampler_options=(0.3, 2.0, 2.0),
                        photometric_prob=0.25)
    train_loader = DetectionLoader(ds, 16, train=True, num_workers=4,
                                   augment_cfg=aug, mesh=mesh)
    val_loader = DetectionLoader(ds, 16, train=False, num_workers=4, mesh=mesh)

    model = SSD300(num_classes=len(ds.classes) + 1, dtype=jnp.bfloat16)
    steps = max(1, len(train_loader))
    tx, _ = build_optimizer(steps_per_epoch=steps, max_epochs=args.epochs,
                            warmup_epochs=2, base_lr=2e-3, min_lr=1e-4,
                            weight_decay=5e-4)
    state = create_train_state(model, tx, jax.random.key(0))
    pri = P.create_priors()
    priors, priors_xyxy = jnp.asarray(pri), jnp.asarray(P.priors_xyxy(pri))
    train_step = make_train_step(model, tx, priors, priors_xyxy,
                                 iou_thresh=0.4, mesh=mesh)
    eval_step = make_eval_step(model, priors, priors_xyxy, iou_thresh=0.4,
                               score_thresh=0.2, nms_thresh=0.3,
                               max_per_img=50, mesh=mesh)

    best = -1.0
    # the train step donates its state; snapshot the best weights to HOST
    # memory or the next step deletes the buffers out from under us
    best_snap = jax.device_get((state.params, state.batch_stats))
    for epoch in range(args.epochs):
        losses = []
        for item in train_loader:
            state, metrics = train_step(state, item.batch)
            losses.append(float(metrics["loss"]))
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            out = evaluate(eval_step, state, val_loader)
            m = out["mAP"]["map_50"]
            print(f"epoch {epoch:3d}  loss={np.mean(losses):7.4f}  mAP@0.5={m:.4f}")
            if m > best:
                best = m
                best_snap = jax.device_get((state.params, state.batch_stats))

    out_path = Path(args.out)
    save_params(best_snap[0], best_snap[1], out_path)
    if args.bundle:
        from ssdx.train.checkpoint import save_params_npz

        bundle = Path(args.bundle)
        save_params_npz(best_snap[0], best_snap[1], bundle)
        print(f"bundle: {bundle} ({bundle.stat().st_size/1e6:.1f} MB f16 npz)")
    print(f"RESULT: {'PASS' if best >= args.min_map else 'FAIL'}  "
          f"best mAP@0.5={best:.4f} -> {out_path}")
    sys.exit(0 if best >= args.min_map else 1)


if __name__ == "__main__":
    main()
