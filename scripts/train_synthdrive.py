"""End-to-end training demonstration on the SynthDrive dataset.

The Udacity data the reference trains on (reference README.md "Results",
mAP@0.5 = 0.5292) is unavailable offline, so this drives the FULL production
path — dataset scan, stratified group split, bootstrap loader, augmentation,
mesh, jitted DP train step, per-epoch eval, checkpointing, plots, weight
export, held-out test evaluation, and a rendered prediction panel — on the
synthetic stand-in (ssdx/data/synth.py).  Same orchestrator
(`ssdx.train.run.run`) and same CLI surface a real-data run uses; only the
pixels are synthetic.

Usage:
  python scripts/train_synthdrive.py --workdir /tmp/synthdrive \
      [--epochs 60] [--n-train 640] [--n-test 160] [--batch-size 16]

Auto-resumes from {workdir}/ckpt/last.ckpt (interrupt and re-run to test
crash-resume).  Writes:
  {workdir}/train/, {workdir}/test/     generated datasets (reused if present)
  {workdir}/ckpt/                       checkpoints + weight exports
  {workdir}/curves.png                  loss/mAP training curves
  {workdir}/panel_*.jpg                 side-by-side GT vs prediction panels
  {workdir}/results.json                final metrics
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="/tmp/synthdrive")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--n-train", type=int, default=640)
    ap.add_argument("--n-test", type=int, default=160)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--base-lr", type=float, default=2e-3)
    ap.add_argument("--warmup-epochs", type=int, default=None,
                    help="default: min(3, epochs//3); the reference recipe "
                    "uses 5 (SSD_model_train.ipynb cell 2)")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)

    from ssdx.data.synth import generate_dataset

    for split, n, seed in (("train", args.n_train, 1), ("test", args.n_test, 2)):
        out = wd / split
        if not (out / "annotations.csv").exists():
            t0 = time.perf_counter()
            generate_dataset(out, n, seed=seed)
            print(f"generated {split}: {n} images "
                  f"({time.perf_counter() - t0:.1f}s)")
        else:
            print(f"reusing existing {split} dataset at {out}")

    from ssdx.config import Config, DataConfig, EvalConfig, TrainConfig
    from ssdx.train.run import run

    cfg = Config(
        data=DataConfig(
            train_dir=str(wd / "train"),
            test_dir=str(wd / "test"),
            batch_size=args.batch_size,
            num_workers=4,  # single-core host: decode threads still overlap device time
            # decode each image once, not once per epoch (single-core host;
            # 5k images at 512^2 cache ~3.9 GB of the 125 GB RAM)
            cache_images=True,
        ),
        train=TrainConfig(
            epochs=args.epochs,
            warmup_epochs=(args.warmup_epochs if args.warmup_epochs is not None
                           else min(3, max(1, args.epochs // 3))),
            base_lr=args.base_lr,
            weight_decay=5e-4,
            save_dir=str(wd / "ckpt"),
        ),
        eval=EvalConfig(),
    )
    (wd / "config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=2))

    t0 = time.perf_counter()
    state, results, class_to_idx = run(cfg, resume=not args.no_resume)
    train_wall = time.perf_counter() - t0
    print(f"training wall time: {train_wall:.0f}s")

    # ---- curves ----
    try:
        from ssdx.viz import plot_losses

        fig = plot_losses(results)
        fig.savefig(wd / "curves.png", dpi=110, bbox_inches="tight")
        print(f"wrote {wd / 'curves.png'}")
    except Exception as e:  # plots must never kill the run's results
        print(f"plotting failed: {e}")

    # ---- held-out test evaluation (best + last) ----
    from ssdx.eval.run import evaluate_weights

    def _js(o):  # results curves hold ndarrays / jax scalars
        import numpy as np

        if isinstance(o, np.ndarray):
            return o.tolist()
        return float(o)

    final = {"train_wall_s": round(train_wall, 1),
             "epochs": args.epochs,
             "val_curves": {k: results[k] for k in
                            ("train_loss", "test_loss", "mAP", "epochs")
                            if k in results}}
    # the loop checkpoints 'best' but only exports 'last' weights
    # (ssdx/train/run.py); materialize best.weights from best.ckpt
    best_w = wd / "ckpt" / "best.weights"
    if not best_w.exists() and (wd / "ckpt" / "best.ckpt").exists():
        import pickle

        from ssdx.train.checkpoint import save_params

        with open(wd / "ckpt" / "best.ckpt", "rb") as f:
            ck = pickle.load(f)
        save_params(ck["params"], ck["batch_stats"], best_w)
    for tag in ("best", "last"):
        wpath = wd / "ckpt" / f"{tag}.weights"
        if not wpath.exists():
            continue
        out = evaluate_weights(wpath, wd / "test",
                               batch_size=args.batch_size)
        m = out["mAP"]
        keep = {k: float(m[k]) for k in
                ("map_50", "map_small", "map_medium", "map_large", "mar_100")
                if k in m and hasattr(m[k], "__float__")}
        keep["per_class_ap50"] = {
            out["classes"][int(c)]: float(ap)
            for c, ap in zip(m["classes"], m["map_per_class"])
        }
        keep["test_loss"] = float(out["testing loss"])
        final[f"test_{tag}"] = keep
        print(f"[{tag}] test mAP@0.5 = {keep['map_50']:.4f}  "
              f"per-class {keep['per_class_ap50']}")

    # ---- prediction panels on test images ----
    try:
        import numpy as np
        from PIL import Image

        from ssdx.api import Detector

        det = Detector.from_weights(wd / "ckpt" / "best.weights",
                                    class_to_idx, fold_bn=True)
        test_imgs = sorted((wd / "test").glob("*.jpg"))[:3]
        from ssdx.viz import side_by_side_prediction

        for i, p in enumerate(test_imgs):
            panel = side_by_side_prediction(det, pil_img=Image.open(p),
                                            score_thresh=0.4)
            panel.save(wd / f"panel_{i}.jpg")
        print(f"wrote {len(test_imgs)} prediction panels")
    except Exception as e:
        print(f"panel rendering failed: {e}")

    (wd / "results.json").write_text(json.dumps(final, indent=2, default=_js))
    print(json.dumps({k: v for k, v in final.items()
                      if k.startswith("test_")}, indent=2, default=_js))


if __name__ == "__main__":
    main()
