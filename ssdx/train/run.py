"""End-to-end training CLI — the reference's training notebook as a command.

Replaces SSD_model_train.ipynb (SURVEY C26): builds the datasets with a
stratified group val split (25% of train, seed 724), bootstrap-oversampled
training loader, device mesh, SGD + warmup-cosine schedule, auto-resume from
``{save_dir}/last.ckpt`` when present, then runs the train/eval cycle with
the reference's thresholds (match IoU 0.4, eval score 0.2 / NMS 0.3 /
max 100) and finally exports weights-only files for serving.

Usage: ``python -m ssdx.train.run --train-dir data/train [--config cfg.json]
[--epochs N] [--no-resume] [--smoke]``
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax

# Persistent compile cache: honor JAX_COMPILATION_CACHE_DIR.  On jax 0.9.0
# the env var alone is silently ignored (config.optional_string_state does
# not read the environment — see bench.py), so route it through
# jax.config.update.  This matters for chunked/resumed runs: the full train
# step costs minutes of cold compile per process on a tunneled backend.
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from .. import priors as P
from ..config import Config
from ..data.augment import AugmentConfig
from ..data.dataset import DetectionDataset
from ..data.pipeline import DetectionLoader
from ..data.split import make_train_test_split
from ..mesh import create_mesh
from ..model import SSD300
from .checkpoint import load_checkpoint, save_params
from .loop import fit
from .schedule import build_optimizer
from .step import create_train_state, make_eval_step, make_train_step

__all__ = ["run", "main"]


def run(cfg: Config, epochs: int | None = None, resume: bool = True, log=print):
    """Train per config; returns (state, results, detector_class_to_idx)."""
    d, t, e = cfg.data, cfg.train, cfg.eval
    epochs = epochs if epochs is not None else t.epochs

    full = DetectionDataset(d.train_dir)
    train_ds, val_ds = make_train_test_split(
        full, test_size=d.val_fraction, rand_state=d.seed
    )
    log(f"dataset: {len(train_ds)} train / {len(val_ds)} val images, "
        f"classes={full.classes}")
    num_classes = len(full.classes) + 1

    mesh = create_mesh()
    aug = AugmentConfig(
        zoom_out_prob=d.zoom_out_prob,
        min_area_frac=d.min_area_frac,
        small_min_scale=d.small_min_scale,
        large_min_scale=d.large_min_scale,
    )
    mk_train_loader = lambda: DetectionLoader(
        train_ds, d.batch_size, train=True, source_size=d.source_size,
        max_boxes=d.max_boxes, num_workers=d.num_workers, seed=d.seed,
        bootstrap=d.bootstrap, augment_cfg=aug, mesh=mesh,
        cache_images=d.cache_images,
    )
    mk_val_loader = lambda: DetectionLoader(
        val_ds, d.batch_size, train=False, source_size=d.source_size,
        max_boxes=d.max_boxes, num_workers=d.num_workers, seed=d.seed, mesh=mesh,
        cache_images=d.cache_images,
    )
    # Loader objects are persistent (thread pool reuse, like the reference's
    # persistent_workers); fit() re-iterates them each epoch.
    train_loader = mk_train_loader()
    val_loader = mk_val_loader()
    steps_per_epoch = max(1, len(train_loader))

    model = SSD300(
        num_classes=num_classes,
        dtype=jnp.bfloat16 if t.bfloat16 else jnp.float32,
        width_mult=t.width_mult,
    )
    tx, sched = build_optimizer(
        steps_per_epoch=steps_per_epoch,
        max_epochs=t.epochs,
        warmup_epochs=t.warmup_epochs,
        base_lr=t.base_lr,
        min_lr=t.min_lr,
        momentum=t.momentum,
        weight_decay=t.weight_decay,
        scheduler=getattr(t, "scheduler", "cosine"),
        plateau_factor=getattr(t, "plateau_factor", 0.1),
        plateau_patience=getattr(t, "plateau_patience", 10),
    )
    lr_controller = sched if getattr(t, "scheduler", "cosine") == "plateau" else None
    rng = jax.random.key(t.seed)
    state = create_train_state(model, tx, rng)

    past_train_dict = None
    best_err = None
    resume_path = Path(t.save_dir) / "last.ckpt"
    if resume and resume_path.exists():
        state, start_epoch, best_err, past_train_dict, saved_key = load_checkpoint(
            resume_path, state
        )
        if saved_key is not None:
            rng = saved_key
        # start_epoch = number of completed epochs; only train the remainder
        # (re-running the same command after an interruption must not train
        # the full configured count again).
        completed = start_epoch
        remaining = max(0, epochs - completed)
        log(
            f"resumed from {resume_path}: {completed} epochs done, "
            f"{remaining} of {epochs} remaining"
        )
        epochs = remaining

    pri = P.create_priors()
    priors = jnp.asarray(pri)
    priors_xyxy = jnp.asarray(P.priors_xyxy(pri))

    train_step = make_train_step(
        model, tx, priors, priors_xyxy,
        iou_thresh=t.iou_thresh, neg_pos_ratio=t.neg_pos_ratio, mesh=mesh,
        fused_stem=getattr(t, "fused_stem", None),
    )
    eval_step = make_eval_step(
        model, priors, priors_xyxy,
        iou_thresh=t.iou_thresh, neg_pos_ratio=t.neg_pos_ratio,
        score_thresh=e.score_thresh, nms_thresh=e.nms_thresh,
        max_per_img=e.max_per_img, mesh=mesh,
    )

    state, results = fit(
        train_step,
        eval_step,
        state,
        train_loader_fn=lambda: train_loader,
        val_loader_fn=lambda: val_loader,
        epochs=epochs,
        early_stopping_rounds=t.early_stopping_rounds,
        save_model=True,
        save_best_model=True,
        epoch_save_interval=t.epoch_save_interval,
        save_dir=t.save_dir,
        timing=True,
        past_train_dict=past_train_dict,
        rng_key=rng,
        initial_best_err=best_err,
        lr_controller=lr_controller,
        log=log,
    )

    save_params(state.params, state.batch_stats, Path(t.save_dir) / "last.weights")
    return state, results, full.class_to_idx


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="JSON config overrides")
    ap.add_argument("--train-dir")
    ap.add_argument("--save-dir")
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="2 epochs, small batch — pipeline sanity run")
    args = ap.parse_args(argv)

    cfg = Config.from_json(args.config) if args.config else Config()
    import dataclasses

    if args.train_dir:
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, train_dir=args.train_dir))
    if args.save_dir:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, save_dir=args.save_dir))
    if args.smoke:
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, batch_size=8, num_workers=2),
            train=dataclasses.replace(cfg.train, epochs=2),
        )
        args.epochs = 2

    run(cfg, epochs=args.epochs, resume=not args.no_resume)


if __name__ == "__main__":
    main()
