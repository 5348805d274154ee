"""Mean Average Precision @ IoU 0.5 with per-class breakdown.

Replaces torchmetrics' ``MeanAveragePrecision(iou_thresholds=[0.50],
class_metrics=True)`` used by the reference eval step (SSD_trainer.py:196) —
pycocotools is a C backend; this is a self-contained numpy implementation of
the same COCO evaluation protocol restricted to a single IoU threshold:

  * detections matched greedily in score order to the highest-IoU unmatched
    GT of the same class within the image (IoU >= threshold);
  * PR curve from the global score-sorted TP/FP sequence per class;
  * AP = 101-point interpolated precision (COCO recall grid, with the
    precision envelope), averaged;
  * map = mean over classes that have at least one GT box; classes without
    GT report -1 (torchmetrics convention).

Metric accumulation is host-side; the O(n_det x n_gt) greedy matching inner
loop uses the native C++ kernel (ssdx/ops/native, the analog of pycocotools'
C backend) when a compiler is available, with a numpy fallback.
"""
from __future__ import annotations

import numpy as np

from ..ops import native as _native

__all__ = ["MeanAP"]

_RECALL_GRID = np.linspace(0.0, 1.0, 101)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Plain IoU between xyxy box sets [N,4] x [M,4] -> [N,M]."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.clip(area_a[:, None] + area_b[None, :] - inter, 1e-9, None)


class MeanAP:
    """Streaming mAP@tau accumulator with the torchmetrics update/compute API.

    ``update(preds, targets)`` takes the reference's ragged contract: lists of
    per-image dicts with 'boxes' (xyxy), 'scores' (preds only), 'labels'.
    ``compute()`` returns {'map_50': float, 'map_per_class': np.ndarray,
    'classes': np.ndarray} (keys follow torchmetrics for tau=0.5).
    """

    def __init__(self, iou_threshold: float = 0.5, max_detections: int = 100):
        self.iou_threshold = float(iou_threshold)
        self.max_detections = int(max_detections)
        self.reset()

    def reset(self) -> None:
        # per class: list of (score, is_tp) rows; and GT count
        self._rows: dict[int, list[tuple[float, bool]]] = {}
        self._gt_count: dict[int, int] = {}

    def update(self, preds: list[dict], targets: list[dict]) -> None:
        if len(preds) != len(targets):
            raise ValueError("preds and targets must have equal length")
        for pred, tgt in zip(preds, targets):
            self._update_one(pred, tgt)

    def _update_one(self, pred: dict, tgt: dict) -> None:
        gt_boxes = np.asarray(tgt["boxes"], np.float64).reshape(-1, 4)
        gt_labels = np.asarray(tgt["labels"], np.int64).reshape(-1)
        for c in gt_labels:
            self._gt_count[int(c)] = self._gt_count.get(int(c), 0) + 1

        boxes = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
        scores = np.asarray(pred["scores"], np.float64).reshape(-1)
        labels = np.asarray(pred["labels"], np.int64).reshape(-1)
        if len(scores) > self.max_detections:
            keep = np.argsort(-scores, kind="stable")[: self.max_detections]
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]

        for c in np.unique(np.concatenate([labels, gt_labels])):
            c = int(c)
            det_idx = np.flatnonzero(labels == c)
            gt_idx = np.flatnonzero(gt_labels == c)
            if len(det_idx) == 0:
                continue
            order = det_idx[np.argsort(-scores[det_idx], kind="stable")]
            rows = self._rows.setdefault(c, [])
            if len(gt_idx) == 0:
                rows.extend((float(scores[d]), False) for d in order)
                continue
            if _native.available():
                tp = _native.match_detections(
                    boxes[order], gt_boxes[gt_idx], self.iou_threshold
                )
                rows.extend(
                    (float(scores[d]), bool(t)) for d, t in zip(order, tp)
                )
                continue
            iou = _iou_matrix(boxes[order], gt_boxes[gt_idx])
            matched = np.zeros(len(gt_idx), bool)
            for r, d in enumerate(order):
                cand = np.where(~matched, iou[r], -1.0)
                j = int(np.argmax(cand))
                if cand[j] >= self.iou_threshold:
                    matched[j] = True
                    rows.append((float(scores[d]), True))
                else:
                    rows.append((float(scores[d]), False))

    def _ap_for_class(self, c: int) -> float:
        n_gt = self._gt_count.get(c, 0)
        if n_gt == 0:
            return -1.0
        rows = self._rows.get(c, [])
        if not rows:
            return 0.0
        rows = sorted(rows, key=lambda r: -r[0])
        tp = np.cumsum([r[1] for r in rows])
        fp = np.cumsum([not r[1] for r in rows])
        recall = tp / n_gt
        precision = tp / np.maximum(tp + fp, 1e-9)
        # precision envelope (monotone non-increasing from the right)
        prec_env = np.maximum.accumulate(precision[::-1])[::-1]
        # 101-point interpolation: precision at first recall >= r (COCO)
        idx = np.searchsorted(recall, _RECALL_GRID, side="left")
        interp = np.where(idx < len(prec_env), prec_env[np.minimum(idx, len(prec_env) - 1)], 0.0)
        return float(np.mean(interp))

    def _recall_for_class(self, c: int) -> float:
        n_gt = self._gt_count.get(c, 0)
        if n_gt == 0:
            return -1.0
        rows = self._rows.get(c, [])
        return float(sum(1 for r in rows if r[1]) / n_gt)

    def compute(self) -> dict:
        """Result dict with the torchmetrics key set for a single-threshold
        run (iou_thresholds=[0.5]): 'map' equals 'map_50'; thresholds/area
        splits not evaluated report -1 like torchmetrics does."""
        classes = sorted(set(self._gt_count) | set(self._rows))
        aps = np.asarray([self._ap_for_class(c) for c in classes], np.float32)
        recalls = np.asarray(
            [self._recall_for_class(c) for c in classes], np.float32
        )
        valid = aps > -1.0
        map_50 = float(aps[valid].mean()) if valid.any() else -1.0
        mar = float(recalls[valid].mean()) if valid.any() else -1.0
        return {
            "map": map_50,  # only IoU=0.5 is evaluated
            "map_50": map_50,
            "map_75": -1.0,
            "map_small": -1.0,
            "map_medium": -1.0,
            "map_large": -1.0,
            "mar_100": mar,
            "mar_100_per_class": recalls,
            "map_per_class": aps,
            "classes": np.asarray(classes, np.int64),
        }
