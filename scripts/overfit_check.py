"""Learning-loop validation: overfit a tiny synthetic detection dataset.

Generates 32 images of colored rectangles on noise, runs the REAL training
stack (DetectionLoader -> device augmentation -> jitted DP train step ->
eval + mAP) and reports mAP@0.5 as it climbs.  A healthy stack overfits this
to high mAP within a few dozen epochs; this validates end-to-end learning
without the (unavailable-offline) Udacity data.

Usage: python scripts/overfit_check.py [--epochs 40]
"""
from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))


def make_dataset(root: Path, n: int = 32, size: int = 256, seed: int = 0):
    import cv2

    rng = np.random.default_rng(seed)
    rows = []
    colors = {"car": (255, 40, 40), "truck": (40, 255, 40), "pedestrian": (40, 40, 255)}
    names = list(colors)
    for i in range(n):
        img = rng.integers(0, 60, (size, size, 3), np.uint8)
        name = f"s{i:03d}.jpg"
        for _ in range(rng.integers(1, 4)):
            cls = names[rng.integers(0, 3)]
            w, h = rng.integers(40, 90, 2)
            x = rng.integers(0, size - w)
            y = rng.integers(0, size - h)
            img[y : y + h, x : x + w] = colors[cls]
            rows.append(dict(filename=name, width=size, height=size,
                             **{"class": cls}, xmin=int(x), ymin=int(y),
                             xmax=int(x + w), ymax=int(y + h)))
        cv2.imwrite(str(root / name), img[:, :, ::-1])
    pd.DataFrame(rows).to_csv(root / "ann.csv", index=False)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--augment", action="store_true",
                    help="train with the real crop/flip/photometric policy "
                         "instead of the identity config")
    ap.add_argument("--min-map", type=float, default=None,
                    help="pass threshold (default 0.5, or 0.3 with --augment)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssdx import priors as P
    from ssdx.data.augment import AugmentConfig
    from ssdx.data.dataset import DetectionDataset
    from ssdx.data.pipeline import DetectionLoader
    from ssdx.mesh import create_mesh
    from ssdx.model import SSD300
    from ssdx.train.loop import evaluate
    from ssdx.train.schedule import build_optimizer
    from ssdx.train.step import create_train_state, make_eval_step, make_train_step

    tmp = Path(tempfile.mkdtemp(prefix="ssdx_overfit_"))
    make_dataset(tmp)
    ds = DetectionDataset(tmp)
    print(f"dataset: {len(ds)} images, classes={ds.classes}, "
          f"devices={jax.devices()}")

    mesh = create_mesh()
    if args.augment:
        aug = AugmentConfig()  # the real training policy
    else:
        # light augmentation: no crop/flip/photometric so the model memorizes
        aug = AugmentConfig(small_sampler_options=(2.0,),
                            large_sampler_options=(2.0,),
                            hflip_prob=0.0, photometric_prob=0.0)
    train_loader = DetectionLoader(ds, 16, train=True, source_size=256,
                                   max_boxes=8, num_workers=4, augment_cfg=aug,
                                   mesh=mesh)
    val_loader = DetectionLoader(ds, 16, train=False, source_size=256,
                                 max_boxes=8, num_workers=4, mesh=mesh)

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
                               max_per_img=20, mesh=mesh)

    first_map = last_map = None
    for epoch in range(args.epochs):
        losses = []
        for item in train_loader:
            state, metrics = train_step(state, item.batch)
            losses.append(float(metrics["loss"]))
        if (epoch + 1) % args.eval_every == 0 or epoch == 0:
            out = evaluate(eval_step, state, val_loader)
            m = out["mAP"]["map_50"]
            if first_map is None:
                first_map = m
            last_map = m
            print(f"epoch {epoch:3d}  loss={np.mean(losses):7.4f}  mAP@0.5={m:.4f}")

    min_map = args.min_map if args.min_map is not None else (0.3 if args.augment else 0.5)
    ok = last_map is not None and last_map > min_map and last_map > (first_map or 0)
    print(f"RESULT: {'PASS' if ok else 'FAIL'}  (first mAP={first_map:.4f}, "
          f"final mAP={last_map:.4f})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
