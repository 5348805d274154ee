#!/usr/bin/env python
"""Generate the pedagogy figures referenced by docs/SSD_EXPLAINED.md.

The reference ships illustrative assets (figures/priors_5.gif — prior
tiling, figures/pred_no_nms.gif — raw above-threshold candidates,
figures/pred_after_nms.png — final detections; referenced from
SSD_explained.ipynb).  This script regenerates the same pedagogy from
ssdx's OWN components: the prior generator (ssdx/priors.py), the CIoU
matcher (ssdx/matching.py), and the demo detector + bundled weights on a
procedural scene (ssdx/data/synth.py).

Outputs (docs/figures/):
  priors_levels.png   — per-level prior shapes at a center cell + cell grid
  matching.png        — GT boxes vs the positive priors CIoU matching picks
  pred_no_nms.png     — every above-threshold candidate before NMS
  pred_after_nms.png  — final detections after greedy DIoU-NMS

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/make_explained_figures.py
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

OUT = pathlib.Path(__file__).parent.parent / "docs" / "figures"


def _scene(seed: int = 12, size: int = 512):
    from ssdx.data.synth import render_scene

    rng = np.random.default_rng(seed)
    img, boxes, labels = render_scene(rng, size=size, n_objects=5)
    while len(labels) < 3:  # want a figure with several objects
        img, boxes, labels = render_scene(rng, size=size, n_objects=5)
    return img, boxes, labels


def fig_priors(img300: np.ndarray) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    from ssdx.priors import (ASPECT_RATIOS_PER_LEVEL, FEATURE_MAP_SIZES,
                             _level_whs)

    L = len(FEATURE_MAP_SIZES)
    s = [0.2 + 0.7 * (l / (L - 1)) for l in range(L)] + [1.0]
    fig, axes = plt.subplots(1, 6, figsize=(21, 3.8))
    colors = ["#ff5252", "#ffb300", "#4caf50", "#29b6f6", "#ab47bc", "#ef6c00"]
    for l, ax in enumerate(axes):
        H, W = FEATURE_MAP_SIZES[l]
        ax.imshow(img300, alpha=0.75)
        # faint cell grid
        for g in range(1, W):
            ax.axvline(g * 300 / W, color="w", lw=0.4, alpha=0.5)
            ax.axhline(g * 300 / H, color="w", lw=0.4, alpha=0.5)
        whs = _level_whs(s[l], float(np.sqrt(s[l] * s[l + 1])),
                         ASPECT_RATIOS_PER_LEVEL[l])
        cx = (W // 2 + 0.5) / W * 300
        cy = (H // 2 + 0.5) / H * 300
        for j, (w, h) in enumerate(whs):
            ax.add_patch(Rectangle((cx - w * 150, cy - h * 150), w * 300,
                                   h * 300, fill=False, lw=1.6,
                                   edgecolor=colors[j % len(colors)]))
        ax.set_title(f"level {l}: {H}x{W} cells, k={len(whs)}", fontsize=10)
        ax.set_xlim(0, 300)
        ax.set_ylim(300, 0)
        ax.axis("off")
    fig.suptitle("The 8,732 priors: one set of k shapes per cell of six "
                 "feature-map grids (shapes drawn at the center cell)",
                 fontsize=12)
    fig.tight_layout()
    fig.savefig(OUT / "priors_levels.png", dpi=110, bbox_inches="tight")
    plt.close(fig)


def _fig_to_frame(fig):
    """Render a matplotlib figure to a PIL RGB image."""
    from PIL import Image

    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return Image.fromarray(buf[..., :3])


def fig_priors_gif(img300: np.ndarray) -> None:
    """Animated counterpart of priors_levels.png (reference ships
    figures/priors_3.gif / priors_5.gif): one frame per feature level,
    cycling through the six grids' cell sizes and prior shapes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    from ssdx.priors import (ASPECT_RATIOS_PER_LEVEL, FEATURE_MAP_SIZES,
                             _level_whs)

    L = len(FEATURE_MAP_SIZES)
    s = [0.2 + 0.7 * (l / (L - 1)) for l in range(L)] + [1.0]
    colors = ["#ff5252", "#ffb300", "#4caf50", "#29b6f6", "#ab47bc", "#ef6c00"]
    frames = []
    for l in range(L):
        H, W = FEATURE_MAP_SIZES[l]
        fig, ax = plt.subplots(figsize=(5.2, 5.6))
        ax.imshow(img300, alpha=0.75)
        for g in range(1, W):
            ax.axvline(g * 300 / W, color="w", lw=0.4, alpha=0.5)
            ax.axhline(g * 300 / H, color="w", lw=0.4, alpha=0.5)
        whs = _level_whs(s[l], float(np.sqrt(s[l] * s[l + 1])),
                         ASPECT_RATIOS_PER_LEVEL[l])
        cx = (W // 2 + 0.5) / W * 300
        cy = (H // 2 + 0.5) / H * 300
        for j, (w, h) in enumerate(whs):
            ax.add_patch(Rectangle((cx - w * 150, cy - h * 150), w * 300,
                                   h * 300, fill=False, lw=1.8,
                                   edgecolor=colors[j % len(colors)]))
        ax.set_title(f"level {l}: {H}x{W} cells, k={len(whs)} prior shapes "
                     f"per cell", fontsize=11)
        ax.set_xlim(0, 300)
        ax.set_ylim(300, 0)
        ax.axis("off")
        fig.tight_layout()
        frames.append(_fig_to_frame(fig))
        plt.close(fig)
    frames[0].save(OUT / "priors_levels.gif", save_all=True,
                   append_images=frames[1:], duration=1100, loop=0)


def fig_matching(img300, boxes300, labels, class_names) -> None:
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    from ssdx import priors as P
    from ssdx.matching import match_one

    pri = P.create_priors()
    gt01 = jnp.asarray(boxes300[None] / 300.0)
    lab = jnp.asarray(labels[None].astype(np.int32))
    val = jnp.ones((1, len(labels)), bool)
    loc_t, cls_t, pos = match_one(
        gt01[0], lab[0], val[0], jnp.asarray(pri),
        jnp.asarray(P.priors_xyxy(pri)), iou_thresh=0.4,
    )
    pos = np.asarray(pos)
    pri_xyxy = P.priors_xyxy(pri) * 300.0

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.imshow(img300)
    for b in pri_xyxy[pos]:
        ax.add_patch(Rectangle((b[0], b[1]), b[2] - b[0], b[3] - b[1],
                               fill=False, lw=0.9, edgecolor="#ffb300",
                               alpha=0.8))
    for b, l in zip(boxes300, labels):
        ax.add_patch(Rectangle((b[0], b[1]), b[2] - b[0], b[3] - b[1],
                               fill=False, lw=2.4, edgecolor="#00e676"))
        ax.text(b[0], b[1] - 3, class_names[int(l)], color="#00e676",
                fontsize=10, weight="bold")
    ax.set_title(f"CIoU matching at iou_thresh=0.4: {int(pos.sum())} positive "
                 f"priors (orange) for {len(labels)} ground-truth boxes (green)")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(OUT / "matching.png", dpi=110, bbox_inches="tight")
    plt.close(fig)
    return int(pos.sum())


def fig_nms(img300_raw, det) -> None:
    """Pre-NMS candidates vs post-NMS detections from the demo detector."""
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    from ssdx import boxes as B

    arr = det.preprocess_pil_np(img300_raw) if hasattr(det, "preprocess_pil_np") \
        else None
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    norm = ((img300_raw.astype(np.float32) / 255.0 - mean) / std)[None]

    loc, conf = det.forward(jnp.asarray(norm))
    probs = np.asarray(jax.nn.softmax(conf[0].astype(jnp.float32), axis=-1))[:, 1:]
    dec = np.asarray(
        jnp.clip(B.cxcywh_to_xyxy(B.decode(loc[0].astype(jnp.float32),
                                           det.priors, det.variances)), 0, 1)
    ) * 300.0
    pr, cl = np.nonzero(probs > 0.2)  # every above-threshold (prior, class)

    final = det.predict(jnp.asarray(norm), score_thresh=0.2, nms_thresh=0.3,
                        max_per_img=100)[0]

    for name, title, draw_final in (
        ("pred_no_nms.png",
         f"Before NMS: all {len(pr)} above-threshold candidates "
         "(score > 0.2)", False),
        ("pred_after_nms.png",
         f"After greedy DIoU-NMS (thresh 0.3): {len(final['labels'])} "
         "detections", True),
    ):
        fig, ax = plt.subplots(figsize=(7, 7))
        ax.imshow(img300_raw)
        if draw_final:
            for b, s, l in zip(final["boxes"], final["scores"],
                               final["labels"]):
                ax.add_patch(Rectangle((b[0], b[1]), b[2] - b[0], b[3] - b[1],
                                       fill=False, lw=2.2, edgecolor="red"))
                ax.text(b[0], b[1] - 3,
                        f"{det.idx_to_class[int(l)]} {s:.2f}",
                        color="red", fontsize=9, weight="bold")
        else:
            for p, c in zip(pr, cl):
                b = dec[p]
                ax.add_patch(Rectangle((b[0], b[1]), b[2] - b[0], b[3] - b[1],
                                       fill=False, lw=0.8, edgecolor="red",
                                       alpha=0.55))
        ax.set_title(title)
        ax.axis("off")
        fig.tight_layout()
        fig.savefig(OUT / name, dpi=110, bbox_inches="tight")
        plt.close(fig)


def fig_nms_gif(img300_raw, det) -> None:
    """Animated counterpart of pred_no_nms.png (reference ships
    figures/pred_no_nms.gif): candidates accumulate in descending score
    order, then the final frame snaps to the post-NMS detections."""
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    from ssdx import boxes as B

    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    norm = ((img300_raw.astype(np.float32) / 255.0 - mean) / std)[None]

    loc, conf = det.forward(jnp.asarray(norm))
    probs = np.asarray(jax.nn.softmax(conf[0].astype(jnp.float32), axis=-1))[:, 1:]
    dec = np.asarray(
        jnp.clip(B.cxcywh_to_xyxy(B.decode(loc[0].astype(jnp.float32),
                                           det.priors, det.variances)), 0, 1)
    ) * 300.0
    pr, cl = np.nonzero(probs > 0.2)
    order = np.argsort(-probs[pr, cl])
    pr, cl = pr[order], cl[order]
    final = det.predict(jnp.asarray(norm), score_thresh=0.2, nms_thresh=0.3,
                        max_per_img=100)[0]

    n_steps = 6
    cuts = [max(1, round(len(pr) * (i + 1) / n_steps)) for i in range(n_steps)]
    frames = []
    for n in cuts + [None]:  # None = final post-NMS frame
        fig, ax = plt.subplots(figsize=(5.2, 5.6))
        ax.imshow(img300_raw)
        if n is None:
            for b, sc, l in zip(final["boxes"], final["scores"],
                                final["labels"]):
                ax.add_patch(Rectangle((b[0], b[1]), b[2] - b[0], b[3] - b[1],
                                       fill=False, lw=2.2, edgecolor="red"))
                ax.text(b[0], b[1] - 3, f"{det.idx_to_class[int(l)]} {sc:.2f}",
                        color="red", fontsize=9, weight="bold")
            ax.set_title(f"after greedy DIoU-NMS: {len(final['labels'])} "
                         "detections", fontsize=11)
        else:
            for p in pr[:n]:
                b = dec[p]
                ax.add_patch(Rectangle((b[0], b[1]), b[2] - b[0], b[3] - b[1],
                                       fill=False, lw=0.8, edgecolor="red",
                                       alpha=0.55))
            ax.set_title(f"before NMS: top {n} of {len(pr)} candidates "
                         "(score > 0.2, descending)", fontsize=11)
        ax.axis("off")
        fig.tight_layout()
        frames.append(_fig_to_frame(fig))
        plt.close(fig)
    durations = [700] * n_steps + [2200]
    frames[0].save(OUT / "pred_no_nms.gif", save_all=True,
                   append_images=frames[1:], duration=durations, loop=0)


def main() -> None:
    import cv2

    OUT.mkdir(parents=True, exist_ok=True)
    img, boxes, labels = _scene()
    size = img.shape[0]
    img300 = cv2.resize(img, (300, 300), interpolation=cv2.INTER_AREA)
    boxes300 = boxes * (300.0 / size)

    from ssdx.data.synth import CLASSES

    fig_priors(img300)
    fig_priors_gif(img300)
    n_pos = fig_matching(img300, boxes300, labels, CLASSES)
    print(f"matching: {n_pos} positive priors for {len(labels)} GTs")

    from ssdx.serve.app import CLASS_TO_IDX, create_detector

    det = create_detector()
    fig_nms(img300, det)
    fig_nms_gif(img300, det)
    print(f"wrote {sorted(p.name for p in OUT.glob('*'))}")


if __name__ == "__main__":
    main()
