"""Fused, jit-compiled detection augmentation pipeline (device-side).

TPU-native redesign of the reference's torchvision v2 transform chain
(SSD_model_train.ipynb cell 2):

    ToImage -> float32(scale) -> [RandomZoomOut(fill=0, p=.5)] ->
    ConditionalIoUCrop -> SanitizeBoundingBoxes(min_size=1) ->
    RandomHorizontalFlip(.5) -> RandomPhotometricDistort(.5) ->
    Resize(300,300, antialias) -> Normalize(ImageNet)

and the ``ConditionalIoUCrop`` module (SSD_trainer.py:872-1025).

Key idea: zoom-out, IoU-crop and the final 300x300 resize are all *one*
sampled source->view window per image.  Zoom-out places the image in a larger
zero-filled canvas (out-of-bounds source resolves to fill=0); the IoU-crop
samples a window on that canvas and the two compose into a single source
window (see ``_sample_window``), which the resize maps to 300x300 via one
``jax.image.scale_and_translate`` (antialiased) — the whole geometric chain
is one resample instead of three, and everything runs batched on device under
jit with per-image PRNG keys.  Rejection sampling ("trials") becomes a fixed
number of vectorized candidate draws with a first-valid-wins select —
compiler-friendly control flow instead of a data-dependent Python loop.

Crop-sampling semantics follow torchvision v2 RandomIoUCrop exactly (see
``_sample_iou_crop``): an outer loop draws ONE sampler option per round (an
option >= 1.0 is the "no crop" sentinel — the reference passes 2.0,
SSD_trainer.py:979-981) and tries ``trials`` candidate windows against that
option, redrawing the option when all fail; a candidate must satisfy the
aspect-ratio bound, contain at least one box center, and have max IoU over
the center-inside boxes >= the option.  The infinite outer loop is
truncated at ``outer_rounds`` (fixed shapes); the distributional match to a
faithful host-side implementation is asserted in
tests/test_augment_semantics.py.  Boxes whose centers fall outside the
chosen window are dropped (the SanitizeBoundingBoxes step), as are boxes
smaller than ``min_size`` pixels after clamping.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..model import IMAGE_SIZE

__all__ = ["AugmentConfig", "augment_batch", "preprocess_batch", "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class AugmentConfig(NamedTuple):
    """Training-augmentation hyperparameters (reference notebook defaults)."""

    # RandomZoomOut (v2 defaults: side_ratio in [1, 4], fill=0)
    zoom_out_prob: float = 0.0  # reference's best run disables zoom-out
    zoom_out_max: float = 4.0
    # ConditionalIoUCrop (SSD_trainer.py:970-1003 + notebook overrides)
    min_area_frac: float = 0.02
    small_min_scale: float = 0.4
    large_min_scale: float = 0.7
    max_scale: float = 1.0
    min_aspect_ratio: float = 0.75
    max_aspect_ratio: float = 1.33
    small_sampler_options: tuple = (0.0, 0.05, 0.1, 2.0)
    large_sampler_options: tuple = (0.05, 0.1, 0.3, 2.0)
    trials: int = 10
    # torchvision's outer loop redraws the option forever until the sentinel
    # or a success; the fixed-shape form truncates it at ``outer_rounds``
    # (residual-failure probability after 8 rounds is < 1e-3 for the
    # reference's samplers — measured in tests/test_augment_semantics.py)
    outer_rounds: int = 8
    # SanitizeBoundingBoxes
    min_box_size: float = 1.0
    # RandomHorizontalFlip
    hflip_prob: float = 0.5
    # RandomPhotometricDistort (v2 defaults)
    photometric_prob: float = 0.5
    brightness: tuple = (0.875, 1.125)
    contrast: tuple = (0.5, 1.5)
    saturation: tuple = (0.5, 1.5)
    hue: tuple = (-0.05, 0.05)


# ---------------------------------------------------------------------------
# color ops (match torchvision functional semantics on float [0,1] RGB)
# ---------------------------------------------------------------------------

def _grayscale(img):
    # ITU-R 601 luma, like torchvision rgb_to_grayscale
    return (
        0.299 * img[..., 0:1] + 0.587 * img[..., 1:2] + 0.114 * img[..., 2:3]
    )


def _adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def _adjust_contrast(img, f):
    mean = jnp.mean(_grayscale(img), axis=(-3, -2, -1), keepdims=True)
    return jnp.clip((img - mean) * f + mean, 0.0, 1.0)


def _adjust_saturation(img, f):
    g = _grayscale(img)
    return jnp.clip((img - g) * f + g, 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r,
        ((g - b) / safe) % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = jnp.where(d > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(img, delta):
    h, s, v = _rgb_to_hsv(img)
    return jnp.clip(_hsv_to_rgb((h + delta) % 1.0, s, v), 0.0, 1.0)


def _photometric_distort(key, img, cfg: AugmentConfig):
    """v2.RandomPhotometricDistort: each sub-op applied with prob p;
    contrast randomly ordered before/after saturation+hue; random channel
    permutation with prob p."""
    ks = jax.random.split(key, 12)
    p = cfg.photometric_prob
    u = jax.random.uniform(ks[0], (6,))

    fb = jax.random.uniform(ks[1], (), minval=cfg.brightness[0], maxval=cfg.brightness[1])
    fc = jax.random.uniform(ks[2], (), minval=cfg.contrast[0], maxval=cfg.contrast[1])
    fs = jax.random.uniform(ks[3], (), minval=cfg.saturation[0], maxval=cfg.saturation[1])
    fh = jax.random.uniform(ks[4], (), minval=cfg.hue[0], maxval=cfg.hue[1])

    img = jnp.where(u[0] < p, _adjust_brightness(img, fb), img)
    contrast_first = u[5] < 0.5
    img = jnp.where(contrast_first & (u[1] < p), _adjust_contrast(img, fc), img)
    img = jnp.where(u[2] < p, _adjust_saturation(img, fs), img)
    img = jnp.where(u[3] < p, _adjust_hue(img, fh), img)
    img = jnp.where(~contrast_first & (u[1] < p), _adjust_contrast(img, fc), img)

    perm = jax.random.permutation(ks[5], 3)
    img = jnp.where(jax.random.uniform(ks[6], ()) < p, img[..., perm], img)
    return img


# ---------------------------------------------------------------------------
# geometry: one sampled window = zoom-out + IoU-crop + resize
# ---------------------------------------------------------------------------

def _window_iou(win, boxes):
    """IoU of one xyxy window [4] vs boxes [G, 4] -> [G]."""
    lt = jnp.maximum(win[:2], boxes[:, :2])
    rb = jnp.minimum(win[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    area_w = (win[2] - win[0]) * (win[3] - win[1])
    area_b = jnp.clip(boxes[:, 2] - boxes[:, 0], 0, None) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    return inter / jnp.clip(area_w + area_b - inter, 1e-7, None)


def _sample_iou_crop(key, size, boxes, valid, min_scale, options, cfg: AugmentConfig):
    """Fixed-shape form of torchvision v2 RandomIoUCrop's sampling loop.

    torchvision (relied on via ConditionalIoUCrop, SSD_trainer.py:979-1003)
    runs: an OUTER infinite loop drawing ONE sampler option per iteration —
    a sentinel option (>= 1.0) returns the identity immediately; otherwise
    an inner loop of ``trials`` candidate windows is tried against that one
    option, and if all fail the outer loop redraws the option.  Here the
    outer loop is truncated at ``cfg.outer_rounds`` rounds (all rounds'
    candidates are drawn vectorized up front; first successful round wins,
    first valid candidate within it), with an identity fallback for the
    < 1e-3-probability case that every round fails.

    Candidate validity matches torchvision exactly: aspect-ratio bound,
    at least one GT center strictly inside, and max IoU **over the
    center-inside boxes only** >= the round's option (boxes whose centers
    fall outside do not count toward the IoU requirement).

    Returns an xyxy window in source pixel coords.
    """
    R, T = cfg.outer_rounds, cfg.trials
    kopt, kw, kh, kx, ky = jax.random.split(key, 5)
    options = jnp.asarray(options, jnp.float32)
    opt = options[jax.random.randint(kopt, (R,), 0, options.shape[0])]  # [R]

    w = jax.random.uniform(kw, (R, T), minval=min_scale, maxval=cfg.max_scale) * size
    h = jax.random.uniform(kh, (R, T), minval=min_scale, maxval=cfg.max_scale) * size
    aspect = w / h
    aspect_ok = (aspect >= cfg.min_aspect_ratio) & (aspect <= cfg.max_aspect_ratio)
    x0 = jax.random.uniform(kx, (R, T)) * (size - w)
    y0 = jax.random.uniform(ky, (R, T)) * (size - h)
    wins = jnp.stack([x0, y0, x0 + w, y0 + h], axis=-1)  # [R, T, 4]

    centers = 0.5 * (boxes[:, :2] + boxes[:, 2:])  # [G, 2]
    inside = (
        (centers[None, None, :, 0] > wins[..., 0:1])
        & (centers[None, None, :, 0] < wins[..., 2:3])
        & (centers[None, None, :, 1] > wins[..., 1:2])
        & (centers[None, None, :, 1] < wins[..., 3:4])
    ) & valid[None, None, :]  # [R, T, G]
    center_ok = inside.any(axis=-1)

    ious = jax.vmap(jax.vmap(lambda wn: _window_iou(wn, boxes)))(wins)  # [R, T, G]
    # torchvision computes the IoU requirement over center-inside boxes only
    ious = jnp.where(inside, ious, -1.0)
    iou_ok = jnp.max(ious, axis=-1) >= opt[:, None]

    cand_ok = aspect_ok & iou_ok & center_ok  # [R, T]
    sentinel = opt >= 1.0  # [R]; "no crop": round succeeds with identity
    round_ok = sentinel | cand_ok.any(axis=-1)

    # size may be traced (the zoomed canvas side); build the window with stack
    size = jnp.asarray(size, jnp.float32)
    identity = jnp.stack([0.0 * size, 0.0 * size, size, size])

    # First valid candidate within each round, then first successful round.
    # Mask-reductions rather than ``wins[argmax(ok)]``: the scalar-index
    # gather form is miscompiled to zeros by the experimental TPU transport
    # backend when fused under vmap (verified empirically); the masked sum is
    # equivalent and robust.
    first_cand = cand_ok & (jnp.cumsum(cand_ok.astype(jnp.int32), axis=-1) == 1)
    round_win = jnp.sum(wins * first_cand[..., None].astype(jnp.float32), axis=1)
    round_win = jnp.where(sentinel[:, None], identity[None, :], round_win)  # [R, 4]
    first_round = round_ok & (jnp.cumsum(round_ok.astype(jnp.int32)) == 1)
    win = jnp.sum(round_win * first_round[:, None].astype(jnp.float32), axis=0)
    return jnp.where(round_ok.any(), win, identity)


def _sample_window(key, size, boxes, labels, valid, cfg: AugmentConfig):
    """Sample the full geometric window for one image: optional zoom-out
    *composed with* ConditionalIoUCrop, exactly like the reference chain
    (SSD_model_train.ipynb cell 2 applies RandomZoomOut and then
    ConditionalIoUCrop to the same image; policy choice SSD_trainer.py:
    1007-1025).

    Composition: zoom-out conceptually places the source image at offset
    (zx, zy) inside a ``big x big`` zero-filled canvas; the IoU-crop then
    samples a window on that canvas (so its scale bounds, sampler IoUs, and
    the area-fraction policy choice are all relative to the *zoomed* canvas,
    as in the reference).  A canvas window maps back to source coordinates by
    subtracting the offset, yielding one final source window — still a single
    resample.
    """
    kz, kzr, kzx, kzy, kcs, kcl = jax.random.split(key, 6)

    # ---- RandomZoomOut (v2 defaults: side_ratio U[1,4], fill=0) ----
    do_zoom = (jax.random.uniform(kz, ()) < cfg.zoom_out_prob) & (cfg.zoom_out_prob > 0)
    r = jax.random.uniform(kzr, (), minval=1.0, maxval=cfg.zoom_out_max)
    big = size * r
    zx = jax.random.uniform(kzx, ()) * (big - size)
    zy = jax.random.uniform(kzy, ()) * (big - size)

    canvas = jnp.where(do_zoom, big, size)
    ox = jnp.where(do_zoom, zx, 0.0)
    oy = jnp.where(do_zoom, zy, 0.0)
    offset = jnp.stack([ox, oy, ox, oy])
    cboxes = boxes + offset  # GT in canvas coordinates

    # ---- ConditionalIoUCrop on the (possibly zoomed) canvas ----
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0, None) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    # area fraction relative to the canvas the crop sees (SSD_trainer.py:1014)
    area_frac = jnp.where(valid, area / (canvas * canvas), 0.0)
    has_any_box = valid.any()
    has_large = (area_frac >= cfg.min_area_frac).any()

    crop_small = _sample_iou_crop(
        kcs, canvas, cboxes, valid, cfg.small_min_scale, cfg.small_sampler_options, cfg
    )
    crop_large = _sample_iou_crop(
        kcl, canvas, cboxes, valid, cfg.large_min_scale, cfg.large_sampler_options, cfg
    )
    crop_win = jnp.where(has_large, crop_large, crop_small)
    identity = jnp.stack([0.0 * canvas, 0.0 * canvas, canvas, canvas])
    crop_win = jnp.where(has_any_box, crop_win, identity)  # no boxes: pass through

    return crop_win - offset  # canvas window -> source coordinates


def _resample_to_output(img, win, out_size):
    """Map the xyxy source window to an [out, out] image with one antialiased
    resample; out-of-bounds source area resolves to 0 (zoom-out fill)."""
    ww = win[2] - win[0]
    wh = win[3] - win[1]
    scale = jnp.stack([out_size / wh, out_size / ww])
    translation = jnp.stack([-win[1] * out_size / wh, -win[0] * out_size / ww])
    return jax.image.scale_and_translate(
        img,
        shape=(out_size, out_size, img.shape[-1]),
        spatial_dims=(0, 1),
        scale=scale,
        translation=translation,
        method="linear",
        antialias=True,
    )


def _augment_one(key, img_u8, boxes, labels, valid, cfg: AugmentConfig, out_size):
    """Full augmentation for one image.

    img_u8: [S, S, 3] uint8; boxes xyxy in source pixels; returns
    (image [out,out,3] normalized float32, boxes xyxy normalized to [0,1],
    labels, valid).
    """
    size = jnp.float32(img_u8.shape[0])
    kwin, kflip, kphoto = jax.random.split(key, 3)
    img = img_u8.astype(jnp.float32) / 255.0

    win = _sample_window(kwin, size, boxes, labels, valid, cfg)

    # ---- boxes -> window coords -> output pixels ----
    ww = win[2] - win[0]
    wh = win[3] - win[1]
    centers = 0.5 * (boxes[:, :2] + boxes[:, 2:])
    center_in = (
        (centers[:, 0] > win[0])
        & (centers[:, 0] < win[2])
        & (centers[:, 1] > win[1])
        & (centers[:, 1] < win[3])
    )
    shift = jnp.concatenate([win[:2], win[:2]])
    sc = jnp.concatenate([jnp.stack([ww, wh])] * 2)
    out_boxes = (boxes - shift) / sc * out_size
    out_boxes = jnp.clip(out_boxes, 0.0, out_size)

    # SanitizeBoundingBoxes(min_size=1) + center-based drop (v2 IoUCrop)
    bw = out_boxes[:, 2] - out_boxes[:, 0]
    bh = out_boxes[:, 3] - out_boxes[:, 1]
    valid = valid & center_in & (bw >= cfg.min_box_size) & (bh >= cfg.min_box_size)

    img = _resample_to_output(img, win, out_size)
    img = jnp.clip(img, 0.0, 1.0)

    # ---- horizontal flip ----
    do_flip = jax.random.uniform(kflip, ()) < cfg.hflip_prob
    img = jnp.where(do_flip, img[:, ::-1, :], img)
    flipped = jnp.stack(
        [out_size - out_boxes[:, 2], out_boxes[:, 1], out_size - out_boxes[:, 0], out_boxes[:, 3]],
        axis=1,
    )
    out_boxes = jnp.where(do_flip, flipped, out_boxes)

    # ---- photometric distort ----
    img = _photometric_distort(kphoto, img, cfg)

    # ---- normalize ----
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    img = (img - mean) / std

    return img, out_boxes / out_size, labels, valid


@partial(jax.jit, static_argnames=("cfg", "out_size"))
def augment_batch(
    key: jax.Array,
    images_u8: jnp.ndarray,  # [B, S, S, 3] uint8
    boxes: jnp.ndarray,  # [B, G, 4] xyxy source pixels
    labels: jnp.ndarray,  # [B, G] int32
    valid: jnp.ndarray,  # [B, G] bool
    cfg: AugmentConfig = AugmentConfig(),
    out_size: int = IMAGE_SIZE,
):
    """Batched training augmentation; returns (images, boxes01, labels, valid)."""
    keys = jax.random.split(key, images_u8.shape[0])
    return jax.vmap(lambda k, i, b, l, v: _augment_one(k, i, b, l, v, cfg, out_size))(
        keys, images_u8, boxes, labels, valid
    )


@partial(jax.jit, static_argnames=("out_size",))
def preprocess_batch(
    images_u8: jnp.ndarray,  # [B, S, S, 3] uint8
    boxes: jnp.ndarray,  # [B, G, 4] xyxy source pixels
    out_size: int = IMAGE_SIZE,
):
    """Eval/serving preprocessing: antialiased resize to 300x300 + ImageNet
    normalize (the reference's test transform, SSD_from_scratch.py:554-560);
    boxes are rescaled to normalized [0, 1] coords."""
    size = images_u8.shape[1]
    img = images_u8.astype(jnp.float32) / 255.0

    def one(im):
        return jax.image.resize(
            im, (out_size, out_size, im.shape[-1]), method="linear", antialias=True
        )

    img = jax.vmap(one)(img)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    img = (jnp.clip(img, 0.0, 1.0) - mean) / std
    return img, boxes / size
