"""Train-mode fused Pallas stem: conv1_1 + BN + ReLU + conv1_2 + BN + ReLU + pool.

The reference's first VGG block in training (torch Conv2d+BatchNorm2d+ReLU
x2 + MaxPool2d, SSD_from_scratch.py:46-60, driven by SSD_trainer.py:21-150)
is the measured bs=16 train-step hotspot: ~12.8 ms of the ~34 ms fwd+bwd
(scripts/bench_train_prefix.py), with conv1_2's FORWARD alone at 3.8 ms —
XLA runs the 64-channel convs at a fraction of MXU peak because 64 output
channels fill half the 128 lanes, and every attempt to fix the tail alone
died on boundary relayouts (ROADMAP gap #4, ssdx/ops/fused_bn_pool.py).

This module extends the inference kernel's layout (ssdx/ops/pallas_stem.py,
"two output pixels per 128-lane register") to training:

* All full-size intermediates (y1, y2, the backward's dt1/dt2) live in HBM
  in the PAIR-PACKED layout ``[B, 300*160, 128]`` — flat (row, pair)
  sublanes, (column-parity, channel) lanes — and are produced AND consumed
  by Pallas kernels, so the lane-crossing relayout that erased the
  fused-pool win never materializes.  Only the kernel-boundary tensors use
  natural layouts: the [B,300,300,3] image (via the same patch pre-pass as
  inference) and the pooled [B,150,150,64] output.
* Train-mode BatchNorm forces global-stats barriers, so the stem is SIX
  pallas_calls + tiny XLA glue instead of inference's one:
    fwd:  A) conv1_1 -> y1 (packed) + per-channel sum/sumsq partials
          B) affine1+ReLU in VMEM -> conv1_2 (one [*,768]x[768,128]
             matmul, same lane-concat trick as inference) -> y2 + partials
          C) affine2+ReLU+2x2 pool -> p (natural layout)
    bwd:  D) recompute pool routing from y2 (self-consistent in-kernel
             equality, even tie split) -> dt2 (packed) + BN2 reduction
             partials (S1, S2)
          E) BN2 backward elementwise -> dy2; conv1_2^T as the SAME
             pair-packed matmul with transposed/reflected weight blocks ->
             dy1n; ReLU mask -> dt1 + BN1 partials; dW2 accumulated
             in-kernel across the grid ([768,128] f32 revisited block)
          F) BN1 backward -> dy1; dW1 = patches^T @ dy1 accumulated
             in-kernel
* dx (image gradient) is analytically not needed (the image is data); the
  op returns zeros for it.  db1/db2 are returned as computed (analytically
  zero under train-mode BN, which subtracts the batch mean).
* Row halos: every row-indexed buffer holds exactly the 300 valid rows.
  Kernels needing rows t*R-1 .. t*R+R use clamped pre/post 2-row views of
  the same buffer plus an in-kernel zero substitution at t==0 / t==T-1 —
  out-of-range rows are exactly SAME-padding zeros (fwd) and their adjoint
  zeros (bwd).
* Invalid pair slots (y1: pair 0's even lane half = column -1, pair 150's
  odd half = column 300, pad pairs >= 151; y2: pairs >= 150) are zeroed at
  every producer, which makes (a) the stats a pure sum over the buffer
  divided by the true N, and (b) the shifted-slice conv reads exact SAME
  padding.  The backward re-zeros them after adding the BN mean-correction
  term (which is nonzero everywhere) so the dW contractions only see valid
  slots.

Numerics: bf16 activations/weights with f32 matmul accumulation and f32
statistics/reductions — the same contract as the XLA train path (flax
dtype=bf16, param_dtype=f32).  Pool ties split the cotangent evenly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stem_train", "stem_train_reference_params"]

_H = 300
_R = 30          # rows per grid step (divides 300, even)
_PAIRS = 151     # y1 logical pairs (y1 columns -1..300 as (pair, parity))
_PP = 160        # physical pair stride (sublane-tile aligned)
_K = 40          # patch channels (36 taps + 3 sentinel + pad)
_CH = 1600       # stage-2 M-chunk (10 image rows)
_M = _R * _PP    # flat rows per main block


# --------------------------------------------------------------------- packing


def _build_patches(x):
    """[B,300,300,3] -> [B, 300*160, 40] conv1_1 input patches (no row halo).

    Channels [0:36] = the 3x4x3 window feeding the column pair, zero outside
    the image; [36],[37] zero (the inference kernel's kill indicators are
    replaced by explicit masks here); [38] = 1 (carries b1 through the
    matmul); [39] = 0.
    """
    B = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (2, 3), (0, 0)))
    slices = []
    for dr in range(3):
        for dc in range(4):
            s = jax.lax.slice(
                xp, (0, dr, dc, 0), (B, dr + _H, dc + _H + 1, 3), (1, 1, 2, 1)
            )  # [B, 300, 151, 3]
            slices.append(s)
    p = jnp.stack(slices, axis=3).reshape(B, _H, _PAIRS, 36)
    p = jnp.pad(p, ((0, 0), (0, 0), (0, _PP - _PAIRS), (0, 0)))
    ones = jnp.ones((B, _H, _PP, 1), p.dtype)
    zeros = jnp.zeros((B, _H, _PP, 1), p.dtype)
    p = jnp.concatenate([p, zeros, zeros, ones, zeros], axis=-1)
    return p.reshape(B, _H * _PP, _K)


def _pack_w1(w1, b1, dtype):
    """HWIO [3,3,3,64] + [64] -> [40,128]; row 38 carries b1, no kill rows."""
    w1 = jnp.asarray(w1, dtype)
    W1 = jnp.zeros((_K, 128), dtype)
    for dr in range(3):
        for dc in range(4):
            for g in range(2):
                k = dc - g
                if 0 <= k <= 2:
                    W1 = W1.at[
                        (dr * 4 + dc) * 3 : (dr * 4 + dc) * 3 + 3,
                        64 * g : 64 * (g + 1),
                    ].set(w1[dr, k])
    W1 = W1.at[38, 0:64].set(jnp.asarray(b1, dtype))
    W1 = W1.at[38, 64:128].set(jnp.asarray(b1, dtype))
    return W1


def _unpack_dw1(dW1):
    """[40,128] f32 -> (dw1 HWIO [3,3,3,64], db1 [64]) — adjoint of _pack_w1."""
    dw1 = jnp.zeros((3, 3, 3, 64), dW1.dtype)
    for dr in range(3):
        for dc in range(4):
            for g in range(2):
                k = dc - g
                if 0 <= k <= 2:
                    dw1 = dw1.at[dr, k].add(
                        dW1[(dr * 4 + dc) * 3 : (dr * 4 + dc) * 3 + 3,
                            64 * g : 64 * (g + 1)])
    db1 = dW1[38, 0:64] + dW1[38, 64:128]
    return dw1, db1


def _pack_w2(w2, dtype):
    """HWIO [3,3,64,64] -> W2cat [768,128] (fwd) — block 3p+dr holds tap
    2p+g-h for input lane group g -> output group h (zero outside 0..2)."""
    w2 = jnp.asarray(w2, dtype)
    W2 = jnp.zeros((6, 128, 128), dtype)
    for dr in range(3):
        for p in range(2):
            for g in range(2):
                for h in range(2):
                    k = 2 * p + g - h
                    if 0 <= k <= 2:
                        W2 = W2.at[
                            3 * p + dr, 64 * g : 64 * (g + 1),
                            64 * h : 64 * (h + 1)].set(w2[dr, k])
    return W2.reshape(768, 128)


def _pack_w2t(w2, dtype):
    """Transposed-conv weights: W2Tcat block 3p+dr' = (fwd block 3p+2-dr')^T.

    Derivation: dy1n[row r, pair v, g] = sum_{p,dr'} W2[3p+2-dr', g, h]
    * dy2[r-1+dr', v-p, h] — same stencil shape as the forward, with the
    pair shift reversed (v-1 instead of v+1)."""
    W2 = _pack_w2(w2, dtype).reshape(6, 128, 128)
    W2T = jnp.zeros_like(W2)
    for p in range(2):
        for drp in range(3):
            W2T = W2T.at[3 * p + drp].set(W2[3 * p + (2 - drp)].T)
    return W2T.reshape(768, 128)


def _unpack_dw2(dW2):
    """[768,128] f32 -> dw2 HWIO [3,3,64,64] — adjoint of _pack_w2."""
    d = dW2.reshape(6, 128, 128)
    dw2 = jnp.zeros((3, 3, 64, 64), dW2.dtype)
    for dr in range(3):
        for p in range(2):
            for g in range(2):
                for h in range(2):
                    k = 2 * p + g - h
                    if 0 <= k <= 2:
                        dw2 = dw2.at[dr, k].add(
                            d[3 * p + dr, 64 * g : 64 * (g + 1),
                              64 * h : 64 * (h + 1)])
    return dw2


def _masks():
    """(y1_valid [PP,128], y2_valid [PP,128]) bf16 0/1 lane-slot masks."""
    u = jnp.arange(_PP)[:, None]
    lane = jnp.arange(128)[None, :]
    even = lane < 64
    bad1 = ((u == 0) & even) | ((u == _PAIRS - 1) & ~even) | (u >= _PAIRS)
    m1 = (~bad1).astype(jnp.bfloat16)
    m2 = (u < _PAIRS - 1).astype(jnp.bfloat16) * jnp.ones((1, 128), jnp.bfloat16)
    return m1, m2


def _tile_mask(m, rows):
    """[PP,128] -> [rows*PP,128] by row tiling (in-kernel, cheap broadcast)."""
    return jnp.broadcast_to(m[None], (rows, _PP, 128)).reshape(rows * _PP, 128)


# ------------------------------------------------------------------- fwd A: y1


def _ka_kernel(patches_ref, w1_ref, m1_ref, y1_ref, part_ref):
    t = pl.program_id(1)
    b = pl.program_id(0)
    y = jax.lax.dot_general(
        patches_ref[0], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M,128] f32 = conv1_1 + b1 (via patch channel 38)
    y = y * _tile_mask(m1_ref[:], _R).astype(jnp.float32)
    yr = y.astype(y1_ref.dtype)
    y1_ref[0] = yr
    # stats of the ROUNDED activation — matches flax BN seeing the bf16
    # conv output (the backward recomputes xhat from the same buffer)
    yf = yr.astype(jnp.float32)
    s = jnp.sum(yf, axis=0)
    q = jnp.sum(yf * yf, axis=0)
    val = jnp.concatenate([
        jnp.broadcast_to(s, (4, 128)), jnp.broadcast_to(q, (4, 128))], axis=0)
    first = (t == 0) & (b == 0)
    part_ref[:] = jnp.where(first, val, part_ref[:] + val)


# ------------------------------------------------------------------- fwd B: y2


def _edge_zero(rows2, t, is_pre, T):
    """Zero a clamped 2-row halo view when it falls outside the image."""
    cond = (t == 0) if is_pre else (t == T - 1)
    return jnp.where(cond, jnp.zeros_like(rows2), rows2)


def _assemble_halo(main, pre, post, t, T):
    """[M,...] main + clamped 2-row views -> [(R+2)*PP,...] rows t*R-1..t*R+R."""
    pre = _edge_zero(pre, t, True, T)
    post = _edge_zero(post, t, False, T)
    return jnp.concatenate([pre[_PP:], main, post[:_PP]], axis=0)


def _kb_kernel(y1_ref, y1pre_ref, y1post_ref, w2_ref, vec_ref, m1_ref,
               m2_ref, y2_ref, part_ref, y1n_s):
    t = pl.program_id(1)
    b = pl.program_id(0)
    T = pl.num_programs(1)
    f32 = jnp.float32
    a1 = vec_ref[0]   # [128] packed affine scale (gamma1*inv1, both halves)
    b1 = vec_ref[1]   # packed affine shift
    b2 = vec_ref[2]   # conv1_2 bias (both halves)

    y1s = _assemble_halo(y1_ref[0], y1pre_ref[0], y1post_ref[0], t, T)
    y1n = jnp.maximum(y1s.astype(f32) * a1 + b1, 0.0)
    y1n = y1n * _tile_mask(m1_ref[:], _R + 2).astype(f32)
    # halo rows outside the image must be SAME-padding ZEROS, not relu(b1)
    row = jax.lax.broadcasted_iota(
        jnp.int32, ((_R + 2) * _PP, 128), 0) // _PP
    grow = row + t * _R - 1
    y1n = jnp.where((grow >= 0) & (grow < _H), y1n, 0.0)
    y1n_s[:] = y1n.astype(y1n_s.dtype)

    y1n_b = y1n_s[:]
    y1n_shift = jnp.concatenate([y1n_b[1:], y1n_b[:1]], axis=0)  # pair +1
    m2f = _tile_mask(m2_ref[:], 1).astype(f32)  # [PP,128]

    s_acc = jnp.zeros((128,), f32)
    q_acc = jnp.zeros((128,), f32)
    rows_per_chunk = _CH // _PP
    for ci in range(_M // _CH):
        base = ci * _CH
        a2 = jnp.concatenate(
            [y1n_b[dr * _PP + base : dr * _PP + base + _CH] for dr in range(3)]
            + [y1n_shift[dr * _PP + base : dr * _PP + base + _CH]
               for dr in range(3)],
            axis=1,
        )  # [CH, 768]
        acc = jax.lax.dot_general(
            a2, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [CH, 128]
        acc = acc + b2
        acc = acc * jnp.broadcast_to(
            m2f[None], (rows_per_chunk, _PP, 128)).reshape(_CH, 128)
        accr = acc.astype(y2_ref.dtype)
        y2_ref[0, base : base + _CH] = accr
        accf = accr.astype(f32)
        s_acc = s_acc + jnp.sum(accf, axis=0)
        q_acc = q_acc + jnp.sum(accf * accf, axis=0)

    val = jnp.concatenate([
        jnp.broadcast_to(s_acc, (4, 128)),
        jnp.broadcast_to(q_acc, (4, 128))], axis=0)
    first = (t == 0) & (b == 0)
    part_ref[:] = jnp.where(first, val, part_ref[:] + val)


# ----------------------------------------------------------------- fwd C: pool


def _kc_kernel(y2_ref, vec_ref, out_ref):
    f32 = jnp.float32
    a2 = vec_ref[0]
    b2 = vec_ref[1]
    for k in range(_R // 2):
        ta = y2_ref[0, (2 * k) * _PP : (2 * k) * _PP + _PP].astype(f32)
        tb = y2_ref[0, (2 * k + 1) * _PP : (2 * k + 1) * _PP + _PP].astype(f32)
        ya = jnp.maximum(ta * a2 + b2, 0.0)
        yb = jnp.maximum(tb * a2 + b2, 0.0)
        v = jnp.maximum(ya, yb)
        p = jnp.maximum(v[:, :64], v[:, 64:])  # [PP, 64]
        out_ref[0, k] = p[: _PAIRS - 1].astype(out_ref.dtype)


# -------------------------------------------------------- bwd D: pool routing


def _kd_kernel(y2_ref, dp_ref, vec_ref, m2_ref, dt2_ref, part_ref):
    t = pl.program_id(1)
    b = pl.program_id(0)
    f32 = jnp.float32
    a2 = vec_ref[0]
    b2 = vec_ref[1]
    inv2 = vec_ref[2]
    mu2 = vec_ref[3]
    m2f = m2_ref[:].astype(f32)  # [PP,128]

    s1 = jnp.zeros((128,), f32)
    s2 = jnp.zeros((128,), f32)
    for k in range(_R // 2):
        ra = y2_ref[0, (2 * k) * _PP : (2 * k) * _PP + _PP].astype(f32)
        rb = y2_ref[0, (2 * k + 1) * _PP : (2 * k + 1) * _PP + _PP].astype(f32)
        ta = ra * a2 + b2
        tb = rb * a2 + b2
        ya = jnp.maximum(ta, 0.0) * m2f
        yb = jnp.maximum(tb, 0.0) * m2f
        v = jnp.maximum(ya, yb)
        p = jnp.maximum(v[:, :64], v[:, 64:])          # [PP, 64]
        ph = jnp.concatenate([p, p], axis=1)           # [PP, 128]
        pos = ph > 0
        ma = (ya == ph) & pos
        mb = (yb == ph) & pos
        cnt2 = ma.astype(f32) + mb.astype(f32)
        cnt = cnt2[:, :64] + cnt2[:, 64:]
        dpk = dp_ref[0, k].astype(f32)                 # [150, 64]
        dpk = jnp.concatenate(
            [dpk, jnp.zeros((_PP - (_PAIRS - 1), 64), f32)], axis=0)
        gs = dpk / jnp.maximum(cnt, 1.0)
        gh = jnp.concatenate([gs, gs], axis=1)         # [PP, 128]
        da = jnp.where(ma, gh, 0.0)                    # dt2 rows 2k / 2k+1
        db = jnp.where(mb, gh, 0.0)
        dt2_ref[0, (2 * k) * _PP : (2 * k) * _PP + _PP] = da.astype(dt2_ref.dtype)
        dt2_ref[0, (2 * k + 1) * _PP : (2 * k + 1) * _PP + _PP] = \
            db.astype(dt2_ref.dtype)
        xha = (ra - mu2) * inv2
        xhb = (rb - mu2) * inv2
        s1 = s1 + jnp.sum(da + db, axis=0)
        s2 = s2 + jnp.sum(da * xha + db * xhb, axis=0)

    val = jnp.concatenate([
        jnp.broadcast_to(s1, (4, 128)), jnp.broadcast_to(s2, (4, 128))], axis=0)
    first = (t == 0) & (b == 0)
    part_ref[:] = jnp.where(first, val, part_ref[:] + val)


# ---------------------------------------------- bwd E: conv1_2^T + dW2 + BN1


def _ke_kernel(R, dt2_ref, dt2pre_ref, dt2post_ref, y2_ref, y2pre_ref,
               y2post_ref, y1_ref, y1pre_ref, y1post_ref, w2t_ref, vec_ref,
               m1_ref, m2_ref, dt1_ref, dw2_ref, part_ref, dy2_s, y1n_s):
    t = pl.program_id(1)
    b = pl.program_id(0)
    T = pl.num_programs(1)
    f32 = jnp.float32
    # vec rows: 0 ginv2 (gamma2*inv2), 1 mu2, 2 inv2, 3 S1_2/n, 4 S2_2/n,
    #           5 a1 (affine1 scale), 6 b1aff (affine1 shift), 7 mu1, 8 inv1
    ginv2 = vec_ref[0]
    mu2 = vec_ref[1]
    inv2 = vec_ref[2]
    c1 = vec_ref[3]
    c2 = vec_ref[4]
    a1 = vec_ref[5]
    b1 = vec_ref[6]
    mu1 = vec_ref[7]
    inv1 = vec_ref[8]

    # BN2 backward (elementwise) on the halo'd rows, invalid slots re-zeroed
    dt2s = _assemble_halo(dt2_ref[0], dt2pre_ref[0], dt2post_ref[0], t, T)
    y2s = _assemble_halo(y2_ref[0], y2pre_ref[0], y2post_ref[0], t, T)
    m2f = _tile_mask(m2_ref[:], R + 2).astype(f32)
    xh2 = (y2s.astype(f32) - mu2) * inv2
    dy2 = ginv2 * (dt2s.astype(f32) - (c1 + xh2 * c2))
    dy2 = dy2 * m2f  # BN mean-correction is nonzero at invalid slots
    # zero halo rows outside the image (adjoint of SAME padding); the edge
    # substitution already zeroed dt2/y2 there, but the correction term is
    # additive and survives it
    row = jax.lax.broadcasted_iota(
        jnp.int32, ((R + 2) * _PP, 128), 0) // _PP
    grow = row + t * R - 1
    dy2 = jnp.where((grow >= 0) & (grow < _H), dy2, 0.0)
    dy2_s[:] = dy2.astype(dy2_s.dtype)

    dy2_b = dy2_s[:]
    dy2_shift = jnp.concatenate([dy2_b[-1:], dy2_b[:-1]], axis=0)  # pair -1

    # recompute y1n (the stage-2 forward operand) with halo for dW2
    y1s = _assemble_halo(y1_ref[0], y1pre_ref[0], y1post_ref[0], t, T)
    y1n = jnp.maximum(y1s.astype(f32) * a1 + b1, 0.0)
    y1n = y1n * _tile_mask(m1_ref[:], R + 2).astype(f32)
    y1n = jnp.where((grow >= 0) & (grow < _H), y1n, 0.0)
    y1n_s[:] = y1n.astype(y1n_s.dtype)
    y1n_b = y1n_s[:]
    y1n_shift = jnp.concatenate([y1n_b[1:], y1n_b[:1]], axis=0)  # pair +1

    m1f1 = _tile_mask(m1_ref[:], _CH // _PP).astype(f32)
    dw2_acc = jnp.zeros((768, 128), f32)
    s1 = jnp.zeros((128,), f32)
    s2 = jnp.zeros((128,), f32)
    for ci in range(R * _PP // _CH):
        base = ci * _CH
        # conv1_2^T: dy1n local rows base..base+CH need dy2 scratch rows
        # base..base+CH+2 (scratch row i = image row t*R-1+i)
        d2 = jnp.concatenate(
            [dy2_b[drp * _PP + base : drp * _PP + base + _CH]
             for drp in range(3)]
            + [dy2_shift[drp * _PP + base : drp * _PP + base + _CH]
               for drp in range(3)],
            axis=1,
        )  # [CH, 768]
        dy1n = jax.lax.dot_general(
            d2, w2t_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [CH, 128]
        # dW2 += a2cat^T @ dy2 at the SAME image rows (scratch offset +PP)
        a2 = jnp.concatenate(
            [y1n_b[dr * _PP + base : dr * _PP + base + _CH]
             for dr in range(3)]
            + [y1n_shift[dr * _PP + base : dr * _PP + base + _CH]
               for dr in range(3)],
            axis=1,
        )  # [CH, 768]
        dy2_main = dy2_b[_PP + base : _PP + base + _CH]
        dw2_acc = dw2_acc + jax.lax.dot_general(
            a2, dy2_main, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        # ReLU' of affine1 -> dt1 (+ BN1 reduction partials)
        y1blk = y1_ref[0, base : base + _CH].astype(f32)
        t1 = y1blk * a1 + b1
        dt1 = jnp.where(t1 > 0, dy1n, 0.0) * m1f1
        dt1_ref[0, base : base + _CH] = dt1.astype(dt1_ref.dtype)
        xh1 = (y1blk - mu1) * inv1
        s1 = s1 + jnp.sum(dt1, axis=0)
        s2 = s2 + jnp.sum(dt1 * xh1, axis=0)

    first = (t == 0) & (b == 0)
    dw2_ref[:] = jnp.where(first, dw2_acc, dw2_ref[:] + dw2_acc)
    val = jnp.concatenate([
        jnp.broadcast_to(s1, (4, 128)), jnp.broadcast_to(s2, (4, 128))], axis=0)
    part_ref[:] = jnp.where(first, val, part_ref[:] + val)


# -------------------------------------------------------------- bwd F: dW1


def _kf_kernel(patches_ref, y1_ref, dt1_ref, vec_ref, m1_ref, dw1_ref):
    t = pl.program_id(1)
    b = pl.program_id(0)
    f32 = jnp.float32
    ginv1 = vec_ref[0]
    mu1 = vec_ref[1]
    inv1 = vec_ref[2]
    c1 = vec_ref[3]
    c2 = vec_ref[4]
    y1 = y1_ref[0].astype(f32)
    xh1 = (y1 - mu1) * inv1
    dy1 = ginv1 * (dt1_ref[0].astype(f32) - (c1 + xh1 * c2))
    dy1 = dy1 * _tile_mask(m1_ref[:], _R).astype(f32)
    acc = jax.lax.dot_general(
        patches_ref[0], dy1.astype(patches_ref.dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # [40, 128]
    first = (t == 0) & (b == 0)
    dw1_ref[:] = jnp.where(first, acc, dw1_ref[:] + acc)


# ------------------------------------------------------------------ assembly


def _grid_specs(B, dtype, lanes=128, R=_R):
    T = _H // R
    main = pl.BlockSpec((1, R * _PP, lanes), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)
    nblk2 = _H // 2  # 2-row blocks in a 300-row buffer
    pre = pl.BlockSpec(
        (1, 2 * _PP, lanes),
        lambda b, t: (b, jnp.clip(t * (R // 2) - 1, 0, nblk2 - 1), 0),
        memory_space=pltpu.VMEM)
    post = pl.BlockSpec(
        (1, 2 * _PP, lanes),
        lambda b, t: (b, jnp.clip(t * (R // 2) + R // 2, 0, nblk2 - 1), 0),
        memory_space=pltpu.VMEM)
    return (B, T), main, pre, post


def _vecspec(rows):
    return pl.BlockSpec((rows, 128), lambda b, t: (0, 0),
                        memory_space=pltpu.VMEM)


def _maskspec():
    return pl.BlockSpec((_PP, 128), lambda b, t: (0, 0),
                        memory_space=pltpu.VMEM)


def _partspec():
    return pl.BlockSpec((8, 128), lambda b, t: (0, 0),
                        memory_space=pltpu.VMEM)


def _fold(v):
    """[128] packed per-lane -> [64] per-channel (sum of the two halves)."""
    return v[:64] + v[64:]


def _bcast(v):
    """[64] per-channel -> [128] packed (both lane halves)."""
    return jnp.concatenate([v, v])


_SEM = pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary"))


def _fwd_impl(patches, W1, W2, b2, g1, be1, g2, be2, eps, interpret, dtype,
              axis_name=None):
    B = patches.shape[0]
    f32 = jnp.float32
    n = B * _H * _H
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
    m1, m2 = _masks()
    grid, main, pre, post = _grid_specs(B, dtype)

    pspec = pl.BlockSpec((1, _M, _K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM)
    y1, part1 = pl.pallas_call(
        _ka_kernel,
        grid=grid,
        in_specs=[pspec, pl.BlockSpec((_K, 128), lambda b, t: (0, 0),
                                      memory_space=pltpu.VMEM), _maskspec()],
        out_specs=[main, _partspec()],
        out_shape=[jax.ShapeDtypeStruct((B, _H * _PP, 128), dtype),
                   jax.ShapeDtypeStruct((8, 128), f32)],
        compiler_params=_SEM, interpret=interpret,
    )(patches, W1, m1)
    s = _fold(part1[0])
    q = _fold(part1[4])
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        q = jax.lax.psum(q, axis_name)
    mean1 = s / n
    var1 = jnp.maximum(q / n - jnp.square(mean1), 0.0)
    inv1 = jax.lax.rsqrt(var1 + eps)
    a1v = _bcast(g1 * inv1)
    b1v = _bcast(be1 - mean1 * g1 * inv1)

    vecB = jnp.stack([a1v, b1v, _bcast(jnp.asarray(b2, f32)),
                      jnp.zeros(128, f32)] + [jnp.zeros(128, f32)] * 4)
    y2, part2 = pl.pallas_call(
        _kb_kernel,
        grid=grid,
        in_specs=[main, pre, post,
                  pl.BlockSpec((768, 128), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  _vecspec(8), _maskspec(), _maskspec()],
        out_specs=[main, _partspec()],
        out_shape=[jax.ShapeDtypeStruct((B, _H * _PP, 128), dtype),
                   jax.ShapeDtypeStruct((8, 128), f32)],
        scratch_shapes=[pltpu.VMEM(((_R + 2) * _PP, 128), dtype)],
        compiler_params=_SEM, interpret=interpret,
    )(y1, y1, y1, W2, vecB, m1, m2)
    s = _fold(part2[0])
    q = _fold(part2[4])
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        q = jax.lax.psum(q, axis_name)
    mean2 = s / n
    var2 = jnp.maximum(q / n - jnp.square(mean2), 0.0)
    inv2 = jax.lax.rsqrt(var2 + eps)
    a2v = _bcast(g2 * inv2)
    b2v = _bcast(be2 - mean2 * g2 * inv2)

    vecC = jnp.stack([a2v, b2v] + [jnp.zeros(128, f32)] * 6)
    p = pl.pallas_call(
        _kc_kernel,
        grid=grid,
        in_specs=[main, _vecspec(8)],
        out_specs=pl.BlockSpec((1, _R // 2, _PAIRS - 1, 64),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, _H // 2, _H // 2, 64), dtype),
        compiler_params=_SEM, interpret=interpret,
    )(y2, vecC)
    stats = (mean1, var1, mean2, var2, inv1, inv2)
    return p, stats, y1, y2


def _bwd_impl(patches, y1, y2, W2T, stats, g1, be1, g2, be2, dp, eps,
              interpret, dtype, axis_name=None):
    B = patches.shape[0]
    f32 = jnp.float32
    n = B * _H * _H
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
    mean1, var1, mean2, var2, inv1, inv2 = stats
    m1, m2 = _masks()
    grid, main, pre, post = _grid_specs(B, dtype)
    z = jnp.zeros(128, f32)

    # ---- D: pool routing (recomputed, self-consistent) + BN2 partials
    dpspec = pl.BlockSpec((1, _R // 2, _PAIRS - 1, 64),
                          lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM)
    a2v = _bcast(g2 * inv2)
    b2v = _bcast(be2 - mean2 * g2 * inv2)
    vecD = jnp.stack([a2v, b2v, _bcast(inv2), _bcast(mean2), z, z, z, z])
    dt2, partD = pl.pallas_call(
        _kd_kernel,
        grid=grid,
        in_specs=[main, dpspec, _vecspec(8), _maskspec()],
        out_specs=[main, _partspec()],
        out_shape=[jax.ShapeDtypeStruct((B, _H * _PP, 128), dtype),
                   jax.ShapeDtypeStruct((8, 128), f32)],
        compiler_params=_SEM, interpret=interpret,
    )(y2, dp, vecD, m2)
    s1_2 = _fold(partD[0])   # dbeta2 (per channel, LOCAL shard sum)
    s2_2 = _fold(partD[4])   # dgamma2
    s1_2g, s2_2g = s1_2, s2_2
    if axis_name is not None:
        # dx needs the GLOBAL sums; the returned dgamma/dbeta stay local
        # because the shard_map transpose of the replicated-in params
        # psums them on the way out
        s1_2g = jax.lax.psum(s1_2, axis_name)
        s2_2g = jax.lax.psum(s2_2, axis_name)

    # ---- E: conv1_2^T + dW2 + BN1 partials
    a1v = _bcast(g1 * inv1)
    b1v = _bcast(be1 - mean1 * g1 * inv1)
    vecE = jnp.stack([
        _bcast(g2 * inv2), _bcast(mean2), _bcast(inv2),
        _bcast(s1_2g / n), _bcast(s2_2g / n),
        a1v, b1v, _bcast(mean1), _bcast(inv1),
        z, z, z, z, z, z, z])  # 16 rows
    R_E = 20  # smaller block: K_E is the VMEM-heaviest kernel (9 views,
    # 2 scratch buffers, 2 matmul concats) and overflows the 16MB scoped
    # limit at R=30
    gridE, mainE, preE, postE = _grid_specs(B, dtype, R=R_E)
    dt1, dW2p, partE = pl.pallas_call(
        functools.partial(_ke_kernel, R_E),
        grid=gridE,
        in_specs=[mainE, preE, postE, mainE, preE, postE, mainE, preE, postE,
                  pl.BlockSpec((768, 128), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  _vecspec(16), _maskspec(), _maskspec()],
        out_specs=[mainE,
                   pl.BlockSpec((768, 128), lambda b, t: (0, 0),
                                memory_space=pltpu.VMEM),
                   _partspec()],
        out_shape=[jax.ShapeDtypeStruct((B, _H * _PP, 128), dtype),
                   jax.ShapeDtypeStruct((768, 128), f32),
                   jax.ShapeDtypeStruct((8, 128), f32)],
        scratch_shapes=[pltpu.VMEM(((R_E + 2) * _PP, 128), dtype)] * 2,
        compiler_params=_SEM, interpret=interpret,
    )(dt2, dt2, dt2, y2, y2, y2, y1, y1, y1, W2T, vecE, m1, m2)
    s1_1 = _fold(partE[0])   # dbeta1 (LOCAL shard sum)
    s2_1 = _fold(partE[4])   # dgamma1
    s1_1g, s2_1g = s1_1, s2_1
    if axis_name is not None:
        s1_1g = jax.lax.psum(s1_1, axis_name)
        s2_1g = jax.lax.psum(s2_1, axis_name)
    dw2 = _unpack_dw2(dW2p)
    # db2 = sum(dy2) = 0 exactly: train-mode BN subtracts the batch mean,
    # so the conv bias has no effect on the output (sum dy2 telescopes to
    # gamma*inv*(S1 - S1 - S2*sum(xhat)/n) with sum(xhat) = 0).
    db2 = jnp.zeros(64, f32)

    # ---- F: dW1 (BN1 backward elementwise + patches contraction)
    vecF = jnp.stack([
        _bcast(g1 * inv1), _bcast(mean1), _bcast(inv1),
        _bcast(s1_1g / n), _bcast(s2_1g / n), z, z, z])
    pspec = pl.BlockSpec((1, _M, _K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM)
    dW1p = pl.pallas_call(
        _kf_kernel,
        grid=grid,
        in_specs=[pspec, main, main, _vecspec(8), _maskspec()],
        out_specs=pl.BlockSpec((_K, 128), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_K, 128), f32),
        compiler_params=_SEM, interpret=interpret,
    )(patches, y1, dt1, vecF, m1)
    dw1, db1 = _unpack_dw1(dW1p)
    # db1 = sum(dy1) = 0 exactly for the same reason as db2; the contraction
    # against the constant patch channel returns reduction noise — drop it.
    db1 = jnp.zeros_like(db1)

    return dw1, db1, s2_1, s1_1, dw2, db2, s2_2, s1_2


# ------------------------------------------------------------------ public op


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def stem_train(x, w1, b1, g1, be1, w2, b2, g2, be2,
               eps: float = 1e-5, interpret: bool | None = None,
               dtype=jnp.bfloat16, axis_name: str | None = None):
    """Fused train-mode stem.

    Args: x [B,300,300,3] images (NO gradient — returns zeros for dx),
    conv weights/biases (HWIO f32), BN scales/offsets (f32).
    Returns ``(p [B,150,150,64], mean1, var1, mean2, var2)`` — the pooled
    feature map plus both layers' biased batch statistics (float32) for
    the caller's running-average update.
    """
    out, _ = _stem_fwd(x, w1, b1, g1, be1, w2, b2, g2, be2, eps, interpret,
                       dtype, axis_name)
    return out


def _stem_fwd(x, w1, b1, g1, be1, w2, b2, g2, be2, eps, interpret,
              dtype=jnp.bfloat16, axis_name=None):
    interpret = _resolve_interpret(interpret)
    patches = _build_patches(x.astype(dtype))
    W1 = _pack_w1(w1, b1, dtype)
    W2 = _pack_w2(w2, dtype)
    p, stats, y1, y2 = _fwd_impl(
        patches, W1, W2, b2, g1.astype(jnp.float32), be1.astype(jnp.float32),
        g2.astype(jnp.float32), be2.astype(jnp.float32), eps, interpret,
        dtype, axis_name)
    mean1, var1, mean2, var2, inv1, inv2 = stats
    out = (p, mean1, var1, mean2, var2)
    res = (x, patches, y1, y2, stats, w2, g1, be1, g2, be2)
    return out, res


def _stem_bwd(eps, interpret, dtype, axis_name, res, cts):
    interpret = _resolve_interpret(interpret)
    x, patches, y1, y2, stats, w2, g1, be1, g2, be2 = res
    dp, dm1, dv1, dm2, dv2 = cts
    W2T = _pack_w2t(w2, dtype)
    dw1, db1, dg1, dbe1, dw2, db2, dg2, dbe2 = _bwd_impl(
        patches, y1, y2, W2T, stats,
        g1.astype(jnp.float32), be1.astype(jnp.float32),
        g2.astype(jnp.float32), be2.astype(jnp.float32),
        dp, eps, interpret, dtype, axis_name)
    # mean/var cotangents: the train step's running-stat update is
    # stop-gradiented (flax convention), so dm*/dv* are zero there; the
    # contribution is dropped (asserted zero-cotangent use only).
    return (jnp.zeros_like(x), dw1.astype(jnp.float32), db1,
            dg1, dbe1, dw2.astype(jnp.float32), db2, dg2, dbe2)


stem_train.defvjp(_stem_fwd, _stem_bwd)


def stem_train_reference_params(params):
    """Extract (w1,b1,g1,be1,w2,b2,g2,be2) from an SSD300 param tree."""
    c0 = params["ConvBNRelu_0"]
    c1 = params["ConvBNRelu_1"]
    return (c0["Conv_0"]["kernel"], c0["Conv_0"]["bias"],
            c0["BatchNorm_0"]["scale"], c0["BatchNorm_0"]["bias"],
            c1["Conv_0"]["kernel"], c1["Conv_0"]["bias"],
            c1["BatchNorm_0"]["scale"], c1["BatchNorm_0"]["bias"])
