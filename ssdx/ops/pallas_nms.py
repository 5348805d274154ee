"""Pallas TPU kernel: batched masked-scan DIoU-NMS core.

The BASELINE north star calls for NMS as "a batched masked-scan kernel"; this
is that kernel.  It computes, per image, the pairwise DIoU matrix of the
score-sorted candidate boxes entirely in VMEM and runs the
alternating-fixpoint suppression scan (see ssdx/nms.py for the algorithm and
its equivalence to exact greedy NMS) without ever materializing the [K, K]
matrix in HBM — one kernel launch per image via the grid, suppression state
kept on-chip.

Two kernels behind one entry point, selected by candidate width K:

* ``K <= _FULL_MATRIX_MAX`` — the original full-matrix form: one [K, K]
  DIoU matrix in VMEM, global alternating fixpoint.
* wider K (the eval thresholds: score 0.05 -> K = 1600 candidates,
  reference behavior SSD_from_scratch.py:433-463) — a TILED sequential-
  greedy form: boxes are walked in score order in tiles of ``_TILE``; a
  tile is first suppressed by the already-DECIDED keeps of earlier tiles
  (block [T, T] DIoU products, streamed through VMEM), then resolved
  internally with the same alternating fixpoint on its [T, T] block.
  Because the global order is the score order, tile-sequential greedy IS
  exact greedy — each tile's decisions depend only on earlier tiles'
  final keeps.  Peak VMEM is O(K*4 + T^2), independent of K^2.

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

_FULL_MATRIX_MAX = 512  # [K,K] f32 working set fits VMEM comfortably to here
_TILE = 256             # tiled-kernel tile width (lane-aligned)


def _diou_mat(br: jnp.ndarray, bc: jnp.ndarray) -> jnp.ndarray:
    """Pairwise DIoU of row boxes [M, 4] vs col boxes [N, 4] -> [M, N]."""
    x1r, y1r, x2r, y2r = br[:, 0:1], br[:, 1:2], br[:, 2:3], br[:, 3:4]
    x1c, y1c, x2c, y2c = bc[:, 0:1].T, bc[:, 1:2].T, bc[:, 2:3].T, bc[:, 3:4].T

    iw = jnp.maximum(jnp.minimum(x2r, x2c) - jnp.maximum(x1r, x1c), 0.0)
    ih = jnp.maximum(jnp.minimum(y2r, y2c) - jnp.maximum(y1r, y1c), 0.0)
    inter = iw * ih
    area_r = jnp.maximum(x2r - x1r, 0.0) * jnp.maximum(y2r - y1r, 0.0)
    area_c = jnp.maximum(x2c - x1c, 0.0) * jnp.maximum(y2c - y1c, 0.0)
    union = area_r + area_c - inter
    iou = inter / jnp.maximum(union, 1e-7)

    ew = jnp.maximum(x2r, x2c) - jnp.minimum(x1r, x1c)
    eh = jnp.maximum(y2r, y2c) - jnp.minimum(y1r, y1c)
    diag2 = ew * ew + eh * eh
    dx = 0.5 * ((x1r + x2r) - (x1c + x2c))
    dy = 0.5 * ((y1r + y2r) - (y1c + y2c))
    d2 = dx * dx + dy * dy
    return iou - d2 / jnp.maximum(diag2, 1e-7)


def _fixpoint(sup: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Alternating-fixpoint suppression on one [K, K] block.

    sup: [K, K] 0/1 with sup[i, j] = "i would suppress j if kept"
    (already masked by i<j and i's validity); v: [1, K] 0/1 validity.
    Returns the suppressed mask s [1, K]; keeps are v * (1 - s).
    """
    k = sup.shape[0]

    def cond(state):
        _, changed, it = state
        return (changed > 0.0) & (it < k)

    def body(state):
        s, _, it = state
        alive = jnp.reshape(v - s, (k, 1))  # [K, 1], 0/1
        new = jnp.max(sup * alive, axis=0, keepdims=True)  # [1, K]
        changed = jnp.max(jnp.abs(new - s))
        return new, changed, it + 1

    s0 = jnp.max(sup, axis=0, keepdims=True)
    s, _, _ = jax.lax.while_loop(cond, body, (s0, jnp.float32(1.0), 1))
    return s


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, thresh: float):
    b = boxes_ref[0]  # [K, 4] float32
    v = valid_ref[0]  # [1, K] float32 0/1
    k = b.shape[0]

    diou = _diou_mat(b, b)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    after = (row_ids < col_ids).astype(jnp.float32)
    v_row = jnp.reshape(v, (k, 1))
    sup = (diou > thresh).astype(jnp.float32) * after * v_row  # [K, K]

    # alternating fixpoint: s(j) = max_i sup[i, j] * alive(i); state kept 2-D
    # ([1, K]) to stay on the (sublane, lane) layout Mosaic expects.
    s = _fixpoint(sup, v)
    out_ref[0] = v * (1.0 - s)


def _nms_tiled_kernel(boxes_ref, valid_ref, out_ref, *, thresh: float):
    """Tile-sequential exact greedy NMS for wide K (see module docstring).

    boxes_ref[0]: [Kpad, 4] score-sorted; valid_ref/out_ref[0]: [1, Kpad].
    Kpad is a multiple of _TILE; pad slots are invalid (never suppress,
    never kept).  out_ref doubles as the decided-keep state: tile t reads
    tiles < t's final keeps from it before writing its own.
    """
    T = _TILE
    k = boxes_ref.shape[1]
    n_t = k // T
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    after = (row_ids < col_ids).astype(jnp.float32)

    def tile_body(t, _):
        off = pl.multiple_of(t * T, T)
        cur = boxes_ref[0, pl.ds(off, T), :]  # [T, 4]
        v_cur = valid_ref[0, 0:1, pl.ds(off, T)]  # [1, T]

        # suppression by earlier tiles' DECIDED keeps
        def prev_body(p, s_cross):
            poff = pl.multiple_of(p * T, T)
            prev = boxes_ref[0, pl.ds(poff, T), :]
            kp = out_ref[0, 0:1, pl.ds(poff, T)]  # [1, T] decided keeps
            d = _diou_mat(prev, cur)  # [T, T]
            hit = (d > thresh).astype(jnp.float32) * kp.reshape(T, 1)
            return jnp.maximum(s_cross, jnp.max(hit, axis=0, keepdims=True))

        s_cross = jax.lax.fori_loop(
            0, t, prev_body, jnp.zeros((1, T), jnp.float32)
        )
        v_eff = v_cur * (1.0 - s_cross)  # cross-suppressed boxes are dead

        # within-tile greedy on the survivors
        d = _diou_mat(cur, cur)
        sup = (d > thresh).astype(jnp.float32) * after * v_eff.reshape(T, 1)
        s = _fixpoint(sup, v_eff)
        out_ref[0, 0:1, pl.ds(off, T)] = v_eff * (1.0 - s)
        return 0

    jax.lax.fori_loop(0, n_t, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("thresh", "interpret"))
def nms_core_sorted(
    boxes_sorted: jnp.ndarray,  # [B, K, 4] float32, score-descending
    valid_sorted: jnp.ndarray,  # [B, K] bool
    thresh: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Keep mask [B, K] (bool, sorted order) for greedy DIoU-NMS.

    Dispatches on width: K <= _FULL_MATRIX_MAX runs the full-matrix
    fixpoint kernel; wider K runs the tiled sequential-greedy kernel
    (inputs padded with invalid slots up to a _TILE multiple)."""
    Bsz, K, _ = boxes_sorted.shape
    tiled = K > _FULL_MATRIX_MAX
    Kp = K
    boxes = boxes_sorted.astype(jnp.float32)
    valid = valid_sorted.astype(jnp.float32)
    if tiled and K % _TILE:
        Kp = ((K + _TILE - 1) // _TILE) * _TILE
        boxes = jnp.pad(boxes, ((0, 0), (0, Kp - K), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, Kp - K)))
    kernel = _nms_tiled_kernel if tiled else _nms_kernel
    # Valid/out carried as [B, 1, K] so each per-image block is a (1, K)
    # tile — Mosaic requires the last two block dims be full or (8, 128)
    # aligned, which a (1, K) block of a [B, K] array is not.
    out = pl.pallas_call(
        functools.partial(kernel, thresh=thresh),
        grid=(Bsz,),
        in_specs=[
            pl.BlockSpec((1, Kp, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bsz, 1, Kp), jnp.float32),
        interpret=interpret,
    )(boxes, valid[:, None, :])
    return out[:, 0, :K] > 0.5
