"""Box geometry: format conversion, IoU family, SSD offset encode/decode.

Pure jax.numpy, shape-polymorphic, jit/vmap friendly.  Replaces the reference's
torchvision C++ ops (``box_convert``, ``box_iou``, ``distance_box_iou``,
``complete_box_iou``; reference SSD_from_scratch.py:3) and the SSD offset math
(``encode_ssd`` reference SSD_from_scratch.py:697-773, ``decode_ssd``
:776-800).  All functions accept arbitrary leading batch dimensions.

Boxes are float arrays of shape ``[..., 4]``; two formats are used:
  * ``xyxy``   — (x1, y1, x2, y2)
  * ``cxcywh`` — (cx, cy, w, h)
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "cxcywh_to_xyxy",
    "xyxy_to_cxcywh",
    "box_area",
    "pairwise_iou",
    "pairwise_diou",
    "pairwise_ciou",
    "encode",
    "decode",
]

_EPS = 1e-7


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    c, s = boxes[..., :2], boxes[..., 2:]
    half = 0.5 * s
    return jnp.concatenate([c - half, c + half], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    lo, hi = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([0.5 * (lo + hi), hi - lo], axis=-1)


def box_area(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; negative extents clamp to zero."""
    wh = jnp.clip(boxes_xyxy[..., 2:] - boxes_xyxy[..., :2], 0.0, None)
    return wh[..., 0] * wh[..., 1]


def _pairwise_intersection(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas for all pairs: a [..., N, 4], b [..., M, 4] -> [..., N, M]."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Plain IoU matrix for xyxy boxes: [..., N, 4] x [..., M, 4] -> [..., N, M]."""
    inter = _pairwise_intersection(a, b)
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / jnp.clip(union, _EPS, None)


def _enclosing_lt_rb(a: jnp.ndarray, b: jnp.ndarray):
    lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    return lt, rb


def pairwise_diou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Distance-IoU matrix (Zheng et al. 2020): IoU - d²(centers)/diag²(hull).

    Matches torchvision ``distance_box_iou`` used by the reference's NMS
    (SSD_from_scratch.py:688).
    """
    iou = pairwise_iou(a, b)
    lt, rb = _enclosing_lt_rb(a, b)
    diag2 = jnp.sum(jnp.square(rb - lt), axis=-1)
    ca = 0.5 * (a[..., :2] + a[..., 2:])
    cb = 0.5 * (b[..., :2] + b[..., 2:])
    d2 = jnp.sum(jnp.square(ca[..., :, None, :] - cb[..., None, :, :]), axis=-1)
    return iou - d2 / jnp.clip(diag2, _EPS, None)


def pairwise_ciou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Complete-IoU matrix: DIoU minus the aspect-ratio consistency term.

    Matches torchvision ``complete_box_iou`` used for prior/GT matching in the
    reference (SSD_from_scratch.py:744).
    """
    diou = pairwise_diou(a, b)
    wa = jnp.clip(a[..., 2] - a[..., 0], _EPS, None)
    ha = jnp.clip(a[..., 3] - a[..., 1], _EPS, None)
    wb = jnp.clip(b[..., 2] - b[..., 0], _EPS, None)
    hb = jnp.clip(b[..., 3] - b[..., 1], _EPS, None)
    ang = jnp.arctan(wb / hb)[..., None, :] - jnp.arctan(wa / ha)[..., :, None]
    v = (4.0 / (jnp.pi**2)) * jnp.square(ang)
    iou = pairwise_iou(a, b)
    # torchvision computes alpha = v / (1 - iou + v + eps) without stopping
    # gradients; we are not differentiating through matching, so keep it plain.
    alpha = v / jnp.clip(1.0 - iou + v, _EPS, None)
    return diou - alpha * v


def encode(
    gt_cxcywh: jnp.ndarray,
    priors_cxcywh: jnp.ndarray,
    variances: tuple[float, float] = (0.1, 0.2),
) -> jnp.ndarray:
    """SSD offset targets (tx, ty, tw, th) for matched GT boxes vs priors.

    t_xy = (gt_c - prior_c) / prior_wh / v_c ;  t_wh = log(gt_wh/prior_wh) / v_s
    with the same 1e-12 clamp as the reference (SSD_from_scratch.py:759-762).
    """
    v_c, v_s = variances
    t_xy = (gt_cxcywh[..., :2] - priors_cxcywh[..., :2]) / priors_cxcywh[..., 2:] / v_c
    ratio = jnp.clip(gt_cxcywh[..., 2:] / priors_cxcywh[..., 2:], 1e-12, None)
    t_wh = jnp.log(ratio) / v_s
    return jnp.concatenate([t_xy, t_wh], axis=-1)


def decode(
    loc: jnp.ndarray,
    priors_cxcywh: jnp.ndarray,
    variances: tuple[float, float] = (0.1, 0.2),
) -> jnp.ndarray:
    """Inverse of :func:`encode`; returns normalized cxcywh boxes.

    cx = tx*v_c*w_p + cx_p ; w = w_p*exp(tw*v_s)  (SSD_from_scratch.py:776-800).
    """
    v_c, v_s = variances
    c = loc[..., :2] * v_c * priors_cxcywh[..., 2:] + priors_cxcywh[..., :2]
    s = priors_cxcywh[..., 2:] * jnp.exp(loc[..., 2:] * v_s)
    return jnp.concatenate([c, s], axis=-1)
