"""Pallas TPU kernel: batched masked-scan DIoU-NMS core.

The BASELINE north star calls for NMS as "a batched masked-scan kernel"; this
is that kernel.  It computes, per image, the pairwise DIoU matrix of the
score-sorted candidate boxes entirely in VMEM and runs the
alternating-fixpoint suppression scan (see ssdx/nms.py for the algorithm and
its equivalence to exact greedy NMS) without ever materializing the [K, K]
matrix in HBM — one kernel launch per image via the grid, suppression state
kept on-chip.

Inputs must be pre-sorted by score descending with invalid candidates sunk to
the end (ssdx.nms handles sorting/scatter and the per-class class-offset
trick).  Boolean state is carried as float32 0/1 masks (TPU-friendly).

Used as the ``backend="pallas"`` alternative in ssdx.nms; numerically
identical to the XLA path (tests compare both against the greedy oracle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_core_sorted"]


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, thresh: float):
    b = boxes_ref[0]  # [K, 4] float32
    v = valid_ref[0]  # [1, K] float32 0/1
    k = b.shape[0]

    x1, y1, x2, y2 = b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4]  # [K, 1]

    # pairwise IoU ([K,1] row boxes vs [1,K] col boxes)
    ix1 = jnp.maximum(x1, x1.T)
    iy1 = jnp.maximum(y1, y1.T)
    ix2 = jnp.minimum(x2, x2.T)
    iy2 = jnp.minimum(y2, y2.T)
    iw = jnp.maximum(ix2 - ix1, 0.0)
    ih = jnp.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # [K, 1]
    union = area + area.T - inter
    iou = inter / jnp.maximum(union, 1e-7)

    # enclosing-box diagonal + center distance -> DIoU
    ex1 = jnp.minimum(x1, x1.T)
    ey1 = jnp.minimum(y1, y1.T)
    ex2 = jnp.maximum(x2, x2.T)
    ey2 = jnp.maximum(y2, y2.T)
    diag2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    cx = 0.5 * (x1 + x2)
    cy = 0.5 * (y1 + y2)
    d2 = (cx - cx.T) ** 2 + (cy - cy.T) ** 2
    diou = iou - d2 / jnp.maximum(diag2, 1e-7)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    after = (row_ids < col_ids).astype(jnp.float32)
    v_row = jnp.reshape(v, (k, 1))
    sup = (diou > thresh).astype(jnp.float32) * after * v_row  # [K, K]

    # alternating fixpoint: s(j) = max_i sup[i, j] * alive(i); state kept 2-D
    # ([1, K]) to stay on the (sublane, lane) layout Mosaic expects.
    def cond(state):
        _, changed, it = state
        return (changed > 0.0) & (it < k)

    def body(state):
        s, _, it = state
        alive = jnp.reshape(v - s, (k, 1))  # [K, 1], 0/1
        new = jnp.max(sup * alive, axis=0, keepdims=True)  # [1, K]
        changed = jnp.max(jnp.abs(new - s))
        return new, changed, it + 1

    s0 = jnp.max(sup, axis=0, keepdims=True)  # [1, K]
    s, _, _ = jax.lax.while_loop(cond, body, (s0, jnp.float32(1.0), 1))

    out_ref[0] = v * (1.0 - s)


@functools.partial(jax.jit, static_argnames=("thresh", "interpret"))
def nms_core_sorted(
    boxes_sorted: jnp.ndarray,  # [B, K, 4] float32, score-descending
    valid_sorted: jnp.ndarray,  # [B, K] bool
    thresh: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Keep mask [B, K] (bool, sorted order) for greedy DIoU-NMS."""
    Bsz, K, _ = boxes_sorted.shape
    # Valid/out carried as [B, 1, K] so each per-image block is a (1, K)
    # tile — Mosaic requires the last two block dims be full or (8, 128)
    # aligned, which a (1, K) block of a [B, K] array is not.
    out = pl.pallas_call(
        functools.partial(_nms_kernel, thresh=thresh),
        grid=(Bsz,),
        in_specs=[
            pl.BlockSpec((1, K, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bsz, 1, K), jnp.float32),
        interpret=interpret,
    )(
        boxes_sorted.astype(jnp.float32),
        valid_sorted.astype(jnp.float32)[:, None, :],
    )
    return out[:, 0, :] > 0.5
