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
    P = priors_xyxy.shape[0]
    iou = B.pairwise_ciou(priors_xyxy, gt_xyxy)  # [P, G]
    iou = jnp.where(gt_valid[None, :], iou, _NEG)

    # Forced bipartite matches: each valid GT's argmax prior -> 2.0.
    # Expressed as a broadcast compare + where rather than a scatter
    # (.at[rows, cols].max): TPU scatters serialize; the [P, G] mask is one
    # fused vector op with identical semantics (2.0 > any real CIoU, and
    # invalid columns keep _NEG).
    best_prior_per_gt = jnp.argmax(iou, axis=0)  # [G]
    forced_mask = (
        jnp.arange(P, dtype=jnp.int32)[:, None] == best_prior_per_gt[None, :]
    ) & gt_valid[None, :]
    iou = jnp.where(forced_mask, 2.0, iou)

    best_gt = jnp.argmax(iou, axis=1)  # [P]
    best_iou = jnp.max(iou, axis=1)  # [P]
    pos = best_iou >= iou_thresh

    gt_cxcywh = B.xyxy_to_cxcywh(gt_xyxy)
    # Row selection via one-hot matmul instead of a [P]-row gather: the MXU
    # does P x G x 5 MACs in microseconds while TPU gathers are
    # latency-bound; exact because each one-hot row has a single 1.0 and
    # the label payload is a small integer (< 2^24).
    onehot = (best_gt[:, None] == jnp.arange(G, dtype=jnp.int32)[None, :]).astype(
        jnp.float32
    )  # [P, G]
    payload = jnp.concatenate(
        [gt_cxcywh, gt_labels.astype(jnp.float32)[:, None]], axis=-1
    )  # [G, 5]
    # precision=highest: the TPU default matmul precision is bfloat16, which
    # truncates the coordinate payload to ~2 decimal digits and the error is
    # then amplified ~10x by encode()'s variance division (caught by
    # scripts/tpu_parity_check.py at max|diff|=0.14); full-f32 MACs on this
    # [P, G] x [G, 5] product are still microseconds.
    picked = jnp.matmul(onehot, payload, precision=jax.lax.Precision.HIGHEST)
    matched = picked[:, :4]
    # Keep encode() finite on padded/degenerate matches (masked out by `pos`).
    safe = jnp.concatenate(
        [matched[:, :2], jnp.clip(matched[:, 2:], 1e-6, None)], axis=-1
    )
    loc_t = B.encode(safe, priors_cxcywh, variances)
    cls_t = jnp.where(pos, picked[:, 4].astype(jnp.int32) + 1, 0)
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
