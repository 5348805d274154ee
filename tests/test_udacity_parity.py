"""Guarded end-to-end Udacity parity runbook (VERDICT r1 task 8).

The Udacity self-driving dataset is not available in this offline
environment, so this test is SKIPPED unless ``UDACITY_DIR`` is set.  The
moment the data appears, the full reference-parity claim is one command:

    UDACITY_DIR=/path/to/export pytest tests/test_udacity_parity.py -s

``UDACITY_DIR`` may point at either
  * the raw Kaggle export (images + ``_annotations.csv``) — the test runs
    the preprocess CLI first (collapse trafficLight-*, add 'empty' rows,
    stratified group split, copy), or
  * an already-preprocessed root containing ``train/`` and ``test/``.

It then trains the reference's best recipe (config defaults: 150 epochs,
bs=16, SGD-Nesterov 3e-3 cosine->1e-6, warmup 5, bootstrap oversampling,
no zoom-out, match IoU 0.4) and evaluates the exported weights on the test
split, asserting mAP@0.5 >= 0.5242 (reference best 0.5292 - 0.5 pt,
README.md:70; BASELINE.md targets).

Knobs for partial runs (all optional):
  UDACITY_EPOCHS    override epoch count (default: config 150)
  UDACITY_MIN_MAP   override the acceptance threshold (default 0.5242)
  UDACITY_WORKDIR   where checkpoints/preprocessed data go (default: tmp)
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("UDACITY_DIR"),
    reason="UDACITY_DIR not set (dataset unavailable in this environment)",
)


def _prepare_data(src: Path, work: Path) -> Path:
    """Return a root containing train/ and test/, preprocessing if needed."""
    if (src / "train").is_dir() and (src / "test").is_dir():
        return src
    from ssdx.data.preprocess import main as preprocess_main

    out = work / "data"
    if not (out / "train").is_dir():
        preprocess_main([str(src), str(out)])
    return out


def test_udacity_full_parity(tmp_path):
    src = Path(os.environ["UDACITY_DIR"])
    work = Path(os.environ.get("UDACITY_WORKDIR", tmp_path))
    work.mkdir(parents=True, exist_ok=True)
    root = _prepare_data(src, work)

    from ssdx.config import Config
    from ssdx.eval.run import evaluate_weights
    from ssdx.train.run import run

    save_dir = work / "ckpts"
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, train_dir=str(root / "train")),
        train=dataclasses.replace(cfg.train, save_dir=str(save_dir)),
    )
    epochs = os.environ.get("UDACITY_EPOCHS")
    # resume=True: an interrupted parity run picks up from last.ckpt
    run(cfg, epochs=int(epochs) if epochs else None, resume=True)

    out = evaluate_weights(
        save_dir / "last.weights",
        root / "test",
        score_thresh=cfg.eval.score_thresh,
        nms_thresh=cfg.eval.nms_thresh,
        max_per_img=cfg.eval.max_per_img,
    )
    m = out["mAP"]
    per_class = {
        out["classes"][int(c)]: float(ap)
        for c, ap in zip(m["classes"], m["map_per_class"])
    }
    print(f"\nUdacity test mAP@0.5 = {m['map_50']:.4f}  per-class: {per_class}")

    min_map = float(os.environ.get("UDACITY_MIN_MAP", "0.5242"))
    assert m["map_50"] >= min_map, (
        f"mAP@0.5 {m['map_50']:.4f} below parity target {min_map:.4f} "
        f"(reference best 0.5292, README.md:70)"
    )
