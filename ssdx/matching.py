"""Batched prior/ground-truth matching and target encoding.

TPU-native replacement for the reference's per-image matching loop
(``build_targets`` SSD_trainer.py:491-547 calling ``mySSD.encode_ssd``
SSD_from_scratch.py:697-773).  Instead of ragged per-image GT tensors and a
Python loop, ground truth is padded to a fixed ``G`` with a validity mask and
the whole batch is matched at once under jit via ``vmap`` — a single
``[B, P, G]`` CIoU computation feeding argmax reductions, which XLA fuses and
tiles onto the VPU.

Semantics preserved from the reference:
  * CIoU matching matrix (complete_box_iou, SSD_from_scratch.py:744).
  * Forced bipartite step: each (valid) GT's best prior gets IoU overwritten
    to 2.0 so every GT has at least one positive (:746-747).
  * pos_mask = best_iou_per_prior >= iou_thresh (:751).
  * Class targets shifted by +1; background = 0 (:769-771).
  * Images with zero GT boxes yield an all-background target (:731-736).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import boxes as B

__all__ = ["Targets", "match_one", "build_targets"]

_NEG = -1e4  # below any real CIoU (range [-2, 1]); marks invalid GT columns


class Targets(NamedTuple):
    """Fixed-shape encoding targets for a batch.

    loc: [B, P, 4] offset targets (garbage on negatives — always mask).
    cls: [B, P] int32 class targets, 0 = background.
    pos: [B, P] bool positive-prior mask.
    """

    loc: jnp.ndarray
    cls: jnp.ndarray
    pos: jnp.ndarray


def match_one(
    gt_xyxy: jnp.ndarray,  # [G, 4] normalized xyxy (padded)
    gt_labels: jnp.ndarray,  # [G] int, 0..C-2 foreground ids (padded)
    gt_valid: jnp.ndarray,  # [G] bool
    priors_cxcywh: jnp.ndarray,  # [P, 4]
    priors_xyxy: jnp.ndarray,  # [P, 4]
    iou_thresh: float,
    variances: tuple[float, float] = (0.1, 0.2),
):
    """Match one image's (padded) GT set against all priors."""
    G = gt_xyxy.shape[0]
    iou = B.pairwise_ciou(priors_xyxy, gt_xyxy)  # [P, G]
    iou = jnp.where(gt_valid[None, :], iou, _NEG)

    # Forced bipartite matches: each valid GT's argmax prior -> 2.0.
    best_prior_per_gt = jnp.argmax(iou, axis=0)  # [G]
    forced = jnp.where(gt_valid, 2.0, _NEG)
    iou = iou.at[best_prior_per_gt, jnp.arange(G)].max(forced)

    best_gt = jnp.argmax(iou, axis=1)  # [P]
    best_iou = jnp.max(iou, axis=1)  # [P]
    pos = best_iou >= iou_thresh

    gt_cxcywh = B.xyxy_to_cxcywh(gt_xyxy)
    matched = gt_cxcywh[best_gt]  # [P, 4]
    # Keep encode() finite on padded/degenerate matches (masked out by `pos`).
    safe = jnp.concatenate(
        [matched[:, :2], jnp.clip(matched[:, 2:], 1e-6, None)], axis=-1
    )
    loc_t = B.encode(safe, priors_cxcywh, variances)
    cls_t = jnp.where(pos, gt_labels[best_gt].astype(jnp.int32) + 1, 0)
    return loc_t, cls_t, pos


@partial(jax.jit, static_argnames=("iou_thresh", "variances"))
def build_targets(
    gt_xyxy: jnp.ndarray,  # [B, G, 4] normalized xyxy
    gt_labels: jnp.ndarray,  # [B, G]
    gt_valid: jnp.ndarray,  # [B, G] bool
    priors_cxcywh: jnp.ndarray,
    priors_xyxy: jnp.ndarray,
    iou_thresh: float = 0.5,
    variances: tuple[float, float] = (0.1, 0.2),
) -> Targets:
    """Vectorized batch form of the reference's build_targets
    (SSD_trainer.py:491-547); GT boxes must already be normalized to [0, 1]."""
    loc, cls, pos = jax.vmap(
        lambda b, l, v: match_one(
            b, l, v, priors_cxcywh, priors_xyxy, iou_thresh, variances
        )
    )(gt_xyxy, gt_labels, gt_valid)
    return Targets(loc=loc, cls=cls, pos=pos)
