"""Jitted train/eval steps over a device mesh.

TPU-native replacement for the reference's per-batch training logic
(``SSD_train_step`` SSD_trainer.py:21-150 and the loss/metric part of
``SSD_test_step`` :155-284).  One fused XLA program per step: forward,
batched matching, multibox loss, backward, optimizer update.  The reference's
timing hooks bracket host-side phases; here phases are fused on device, so the
step timing contract is provided by the loop via ``block_until_ready``
(see ssdx/train/loop.py).

Parallelism: pass a ``Mesh`` to the factories and the step compiles with the
batch sharded over the ``data`` axis and state replicated; XLA inserts the
gradient all-reduce over ICI (SURVEY §2.2).  Without a mesh it is a plain
single-device jit.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import multibox_loss
from ..matching import build_targets
from ..predict import Detections, postprocess

__all__ = ["Batch", "TrainState", "create_train_state", "make_train_step", "make_eval_step"]

_BN_MOMENTUM = 0.9  # flax running-stat update: ra*m + batch*(1-m)


def _fused_stem_supported(model) -> bool:
    """The train-mode Pallas stem is specialized to the full-width 300x300
    stem (64-channel convs); reduced-width test models and pre-folded or
    stem-input variants use the XLA path."""
    return (getattr(model, "width_mult", 1.0) == 1.0
            and not getattr(model, "fold_bn", False)
            and not getattr(model, "stem_input", False))


class Batch(NamedTuple):
    """Fixed-shape training batch (padded GT; see ssdx/data/pipeline.py).

    images:    [B, 300, 300, 3] float32, ImageNet-normalized.
    gt_boxes:  [B, G, 4] xyxy normalized to [0, 1].
    gt_labels: [B, G] int32 0-based foreground labels.
    gt_valid:  [B, G] bool.
    """

    images: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    gt_valid: jnp.ndarray


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model, tx: optax.GradientTransformation, rng: jax.Array, batch_size: int = 1
) -> TrainState:
    variables = model.init_variables(rng, batch_size=batch_size)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
    )


def _shardings(mesh):
    if mesh is None:
        return {}
    from ..mesh import batch_sharding, replicated

    rep, bs = replicated(mesh), batch_sharding(mesh)
    batch_shard = Batch(images=bs, gt_boxes=bs, gt_labels=bs, gt_valid=bs)
    return dict(in_shardings=(rep, batch_shard), out_shardings=(rep, rep))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    priors_cxcywh: jnp.ndarray,
    priors_xyxy: jnp.ndarray,
    iou_thresh: float = 0.5,
    neg_pos_ratio: float = 3.0,
    mesh=None,
    fused_stem: bool | None = None,
):
    """Build the jitted ``(state, batch) -> (state, metrics)`` train step.

    ``fused_stem`` routes the first VGG block through the train-mode Pallas
    stem (ssdx/ops/pallas_stem_train.py — measured 5.9 vs 13.5 ms fwd+bwd
    at bs=16 bf16; full step 455 -> 547 img/s).  Default (None): on for
    TPU runs of the full-width model, off on CPU.  Under a mesh the op is
    shard_mapped over the ``data`` axis with its batch statistics psum'd,
    preserving the XLA path's global-batch (sync) BatchNorm semantics.
    """
    if fused_stem is None:
        fused_stem = (jax.default_backend() in ("tpu", "axon")
                      and _fused_stem_supported(model))
    if fused_stem and not _fused_stem_supported(model):
        raise ValueError("fused_stem requires the full-width SSD300 "
                         "(width_mult=1, no fold_bn/stem_input)")
    if fused_stem:
        from ..ops.pallas_stem_train import (stem_train,
                                             stem_train_reference_params)

        model_stem = model.clone(stem_input=True)
        if mesh is None:
            def stem_fn(images, sp):
                return stem_train(images, *sp, 1e-5, None, model.dtype)
        else:
            from jax.sharding import PartitionSpec as PS

            from ..mesh import DATA_AXIS

            def stem_fn(images, sp):
                return jax.shard_map(
                    lambda img, *a: stem_train(
                        img, *a, 1e-5, None, model.dtype, DATA_AXIS),
                    mesh=mesh,
                    in_specs=(PS(DATA_AXIS),) + (PS(),) * 8,
                    out_specs=(PS(DATA_AXIS), PS(), PS(), PS(), PS()),
                    # pallas_call out_shapes carry no vma annotations
                    check_vma=False,
                )(images, *sp)

    def train_step(state: TrainState, batch: Batch):
        def loss_fn(params):
            if fused_stem:
                sp = stem_train_reference_params(params)
                p, m1, v1, m2, v2 = stem_fn(batch.images, sp)
                (loc, cls), mutated = model_stem.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    p,
                    train=True,
                    mutable=["batch_stats"],
                )
                # running-stat updates for the two stem BNs the fused op
                # replaced (same formula flax applies in-module)
                bs = dict(mutated["batch_stats"])
                for name, bm, bv in (("ConvBNRelu_0", m1, v1),
                                     ("ConvBNRelu_1", m2, v2)):
                    old = bs[name]["BatchNorm_0"]
                    bs[name] = dict(bs[name])
                    bs[name]["BatchNorm_0"] = {
                        "mean": _BN_MOMENTUM * old["mean"]
                        + (1 - _BN_MOMENTUM) * bm,
                        "var": _BN_MOMENTUM * old["var"]
                        + (1 - _BN_MOMENTUM) * bv,
                    }
                mutated = {"batch_stats": bs}
            else:
                (loc, cls), mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch.images,
                    train=True,
                    mutable=["batch_stats"],
                )
            tg = build_targets(
                batch.gt_boxes,
                batch.gt_labels,
                batch.gt_valid,
                priors_cxcywh,
                priors_xyxy,
                iou_thresh,
            )
            total, loc_l, conf_l = multibox_loss(
                loc, cls, tg.loc, tg.cls, tg.pos, neg_pos_ratio
            )
            return total, (loc_l, conf_l, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (loc_l, conf_l, new_bs)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        metrics = {"loss": total, "loss_loc": loc_l, "loss_conf": conf_l}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,), **_shardings(mesh))


def make_eval_step(
    model,
    priors_cxcywh: jnp.ndarray,
    priors_xyxy: jnp.ndarray,
    iou_thresh: float = 0.5,
    neg_pos_ratio: float = 3.0,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    max_per_img: int = 100,
    mesh=None,
):
    """Build the jitted eval step: losses (no backward) + decoded detections,
    mirroring SSD_test_step's reuse of the forward logits for predict
    (SSD_trainer.py:250-256).

    ``img_valid`` [B] bool marks real (non-padded) images; padded tail images
    are excluded from the loss so a wrap-padded final batch reports the same
    loss as the reference's smaller unpadded batch.
    """

    def eval_step(state: TrainState, batch: Batch, img_valid: jnp.ndarray):
        loc, cls = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.images,
            train=False,
        )
        tg = build_targets(
            batch.gt_boxes,
            batch.gt_labels,
            batch.gt_valid,
            priors_cxcywh,
            priors_xyxy,
            iou_thresh,
        )
        total, loc_l, conf_l = multibox_loss(
            loc, cls, tg.loc, tg.cls, tg.pos, neg_pos_ratio, img_valid=img_valid
        )
        det: Detections = postprocess(
            loc,
            cls,
            priors_cxcywh,
            score_thresh=score_thresh,
            nms_thresh=nms_thresh,
            max_per_img=max_per_img,
        )
        metrics = {"loss": total, "loss_loc": loc_l, "loss_conf": conf_l}
        return metrics, det

    kw = {}
    if mesh is not None:
        from ..mesh import batch_sharding, replicated

        rep, bs = replicated(mesh), batch_sharding(mesh)
        batch_shard = Batch(images=bs, gt_boxes=bs, gt_labels=bs, gt_valid=bs)
        kw = dict(
            in_shardings=(rep, batch_shard, bs),
            out_shardings=(rep, Detections(boxes=bs, scores=bs, labels=bs, valid=bs)),
        )
    return jax.jit(eval_step, **kw)
