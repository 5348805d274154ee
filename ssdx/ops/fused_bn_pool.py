"""Fused train-mode BatchNorm + ReLU + 2x2 maxpool with a custom VJP.

STATUS — measured, NOT wired into the model path.  Interleaved
same-process TPU A/B at bs=16 [16,300,300,64] bf16, full fwd+bwd of the
stem tail through ``jax.value_and_grad`` (scripts/stem_train_experiments
``brp*`` variants + /tmp harnesses, 2026-08):

* unfused flax baseline (BN + relu + reduce_window pool):  ~5.4-6.0 ms/iter
* this op, backend="xla"    (packed recompute VJP):         ~7.6 ms — LOSES
* this op, backend="pallas" (4 Pallas passes):              ~5.2-5.5 ms
* this op, backend="xla_mask" (mask-residual, natural):     ~5.3-5.4 ms

The pallas/xla_mask variants are at parity-to-+0.5ms, inside run
variance.  Two structural effects cancel the kernel-level win: (a) the
packed ``[...,W,C] -> [...,W/2,2C]`` view crosses the 128-lane dim, so
XLA inserts full-size relayout copies on x and dx at the pallas-call
boundary (the four Pallas passes themselves run at ~1.7 ms/iter when
inputs/outputs stay packed); (b) XLA's own autodiff fuses the
SelectAndScatter backward into the BatchNorm backward, so the baseline
is already within ~30% of its bandwidth floor.  Kept as a tested op
(tests/test_fused_bn_pool.py) because the pallas path wins if a packed-
layout producer/consumer ever exists; not advertised as a capability.

Why it was tried: the reference leans on cuDNN's fused BN/pool kernels
for the same structure (torch BatchNorm2d + MaxPool2d,
SSD_from_scratch.py:52-60); this module is the TPU-native equivalent,
built so the whole tail runs in a few HBM-speed passes:

* **Forward** never materializes the pre-pool activation: batch stats are one
  reduction pass over the conv output, and normalize+ReLU+pool fuse into a
  second pass that writes only the 4x-smaller pooled map.  (XLA's autodiff
  formulation must keep the full-size activation alive as the
  SelectAndScatter residual.)
* **Backward** recomputes the normalized activation from the conv output
  (already a residual of the conv's own backward) and routes the pooled
  cotangent by max-equality instead of SelectAndScatter.  Ties inside a
  window split the gradient evenly (``tie_split=True``) — the same
  subgradient convention as jnp.max autodiff; torch routes to the first
  max.  The BatchNorm backward reductions ride the same recompute passes.

Layout is the whole game on TPU (all variants measured, bs=16
[16,300,300,64] bf16, scripts/stem_train_experiments.py + /tmp pool form
A/B):

* ``lax.reduce_window`` pool forward: 2.12 ms.  Window-reshape
  ``[B,H/2,2,W/2,2,C].max((2,4))``: 4.37 ms — the trailing (2, C) dims
  land in the tiled (sublane, lane) positions and Mosaic pads 8x16.
  Stride-2 W slices: 2-3x worse still (every operand relayouts).
* The fast form is the **pair-packed view** ``[B, H/2, 2, W/2, 2C]``:
  vertical pooling is an elementwise ``maximum`` of the two row slabs
  (NOT ``.max(axis=2)`` — a size-2 axis reduction lowers 4x slower),
  horizontal pooling a max of the two C-lane halves; trailing dims stay
  (W/2, 2C) = clean (sublane, lane) tiles.  0.72 ms for the same pool.

Semantics match ``flax.linen.BatchNorm(use_running_average=False,
epsilon=eps)`` + ``nn.relu`` + ``ssdx.model._max_pool``: biased batch
variance, float32 statistics, computation in the input dtype.  The
``(mean, var)`` outputs are for the caller's running-stats update; their
cotangent contributions are included in the VJP (exact, not dropped).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bn_relu_pool"]


def _stats(x):
    """Biased per-channel mean/var in float32 (flax's _compute_stats)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    return mean, var


def _affine(gamma, beta, mean, var, eps, dtype):
    """Collapse BN to y = x*a + b; a/b built in float32, cast once."""
    inv = jax.lax.rsqrt(var + eps)
    a = gamma * inv
    b = beta - mean * a
    return a.astype(dtype), b.astype(dtype)


def _packable(shape) -> bool:
    return shape[1] % 2 == 0 and shape[2] % 2 == 0


# ---------------------------------------------------------------- packed path


def _pool_packed(y2):
    """[B,H/2,2,W/2,2C] windows -> [B,H/2,W/2,C] pooled."""
    C2 = y2.shape[-1]
    v = jnp.maximum(y2[:, :, 0], y2[:, :, 1])
    return jnp.maximum(v[..., : C2 // 2], v[..., C2 // 2 :])


def _fwd_packed_out(x, a, b):
    B, H, W, C = x.shape
    x2 = x.reshape(B, H // 2, 2, W // 2, 2 * C)
    ab = jnp.concatenate([a, a])
    bb = jnp.concatenate([b, b])
    y2 = jnp.maximum(x2 * ab + bb, 0)
    return _pool_packed(y2)


def _bwd_packed(x, gamma, beta, mean, var, eps, tie_split, gp, gmean, gvar):
    B, H, W, C = x.shape
    n = B * H * W
    f32 = jnp.float32

    a, b = _affine(gamma, beta, mean, var, eps, x.dtype)
    ab = jnp.concatenate([a, a])
    bb = jnp.concatenate([b, b])
    x2 = x.reshape(B, H // 2, 2, W // 2, 2 * C)
    yhat2 = x2 * ab + bb
    y2 = jnp.maximum(yhat2, 0)
    p = _pool_packed(y2)  # [B,H/2,W/2,C]

    # Routing mask in the window view: position == window max AND pre-ReLU>0.
    ph = jnp.concatenate([p, p], axis=-1)  # horizontal un-fold to 2C lanes
    m2 = (y2 == ph[:, :, None]) & (yhat2 > 0)

    if tie_split:
        mc = m2.astype(f32)
        cnt2 = mc[:, :, 0] + mc[:, :, 1]  # [B,H/2,W/2,2C]
        cnt = cnt2[..., :C] + cnt2[..., C:]  # [B,H/2,W/2,C]
        gshare = (gp.astype(f32) / jnp.maximum(cnt, 1.0)).astype(x.dtype)
    else:
        gshare = gp.astype(x.dtype)
    gh = jnp.concatenate([gshare, gshare], axis=-1)
    dy2 = jnp.where(m2, gh[:, :, None], jnp.zeros((), x.dtype))

    # BatchNorm backward (biased variance); reductions in float32 over the
    # packed lanes, channel halves folded at the end.
    inv = jax.lax.rsqrt(var + eps)  # [C] f32
    invp = jnp.concatenate([inv, inv])
    meanp = jnp.concatenate([mean, mean])
    xf2 = x2.astype(f32)
    dyf2 = dy2.astype(f32)
    xhat2 = (xf2 - meanp) * invp
    s1p = jnp.sum(dyf2, axis=(0, 1, 2, 3))          # [2C]
    s2p = jnp.sum(dyf2 * xhat2, axis=(0, 1, 2, 3))  # [2C]
    s1 = s1p[:C] + s1p[C:]  # = dbeta
    s2 = s2p[:C] + s2p[C:]  # = dgamma
    s1b = jnp.concatenate([s1, s1])
    s2b = jnp.concatenate([s2, s2])
    gip = jnp.concatenate([gamma, gamma]) * invp
    dx2 = gip * (dyf2 - (s1b + xhat2 * s2b) / n)

    # Cotangents of the (mean, var) outputs: mean = E[x], var = E[x^2]-E[x]^2.
    gmp = jnp.concatenate([gmean, gmean])
    gvp = jnp.concatenate([gvar, gvar])
    dx2 = dx2 + gmp / n + gvp * (2.0 / n) * (xf2 - meanp)

    dx = dx2.astype(x.dtype).reshape(B, H, W, C)
    return dx, s2, s1


# --------------------------------------------------------------- general path
# Odd extents / ceil mode (the reference's mp3, 75 -> 38).  Small feature
# maps only; uses the window reshape, which is slower but correct anywhere.


def _pad_even(y, fill):
    if y.shape[1] % 2 or y.shape[2] % 2:
        pad = ((0, 0), (0, y.shape[1] % 2), (0, y.shape[2] % 2), (0, 0))
        y = jnp.pad(y, pad, constant_values=fill)
    return y


def _win(y):
    B, H, W, C = y.shape
    return y.reshape(B, H // 2, 2, W // 2, 2, C)


def _pool_max(y, ceil: bool):
    if ceil:
        y = _pad_even(y, -jnp.inf)
    return _win(y).max(axis=(2, 4))


def _up2(p, H, W):
    B, Hp, Wp, C = p.shape
    u = jnp.broadcast_to(p[:, :, None, :, None, :], (B, Hp, 2, Wp, 2, C))
    return u.reshape(B, 2 * Hp, 2 * Wp, C)[:, :H, :W]


def _bwd_general(x, gamma, beta, mean, var, eps, ceil, tie_split,
                 gp, gmean, gvar):
    B, H, W, C = x.shape
    n = B * H * W
    f32 = jnp.float32

    a, b = _affine(gamma, beta, mean, var, eps, x.dtype)
    yhat = x * a + b
    y = jnp.maximum(yhat, 0)
    p = _pool_max(y, ceil)
    m = (y == _up2(p, H, W)) & (yhat > 0)

    if tie_split:
        mi = _pad_even(m.astype(f32), 0)
        cnt = _win(mi).sum(axis=(2, 4))
        gshare = (gp.astype(f32) / jnp.maximum(cnt, 1.0)).astype(x.dtype)
    else:
        gshare = gp.astype(x.dtype)
    dy = jnp.where(m, _up2(gshare, H, W), jnp.zeros((), x.dtype))

    inv = jax.lax.rsqrt(var + eps)
    xf = x.astype(f32)
    dyf = dy.astype(f32)
    xhat = (xf - mean) * inv
    s1 = jnp.sum(dyf, axis=(0, 1, 2))
    s2 = jnp.sum(dyf * xhat, axis=(0, 1, 2))
    dx = (gamma * inv) * (dyf - (s1 + xhat * s2) / n)
    dx = dx + gmean / n + gvar * (2.0 / n) * (xf - mean)
    return dx.astype(x.dtype), s2, s1


# ------------------------------------------------------- Pallas backward path
# The XLA recompute backward above loses to the unfused baseline (7.6 vs
# 5.6 ms/iter, interleaved TPU A/B at bs=16): the custom_vjp boundary stops
# XLA from fusing the BN backward with the pool routing, and each pass
# re-reads the full-size activation from HBM.  Here the BN backward
# *reductions* ride the same Pallas passes as the pool routing, so the
# whole backward is two bandwidth-bound sweeps:
#
#   pass 1 (reduce): read x, g, masks        -> per-block partial s1, s2
#   pass 2 (dx):     read x, g, masks, s1,s2 -> dx
#
# The routing masks are produced by the *forward* (one fused XLA pass over
# data it already touches) instead of being recomputed: a bf16 0/1 plane
# per window row, compared within the same XLA program as the pooled
# output, so equality routing is exact — a backward recompute of
# ``x*a + b`` could round differently (FMA contraction) and mis-route.
# Mask planes are zeroed where the pooled max is <= 0, which folds the
# ReLU subgradient (relu'(0) = 0) into the routing.


def _pallas_ok(shape) -> bool:
    B, H, W, C = shape
    return (H % 2 == 0 and W % 2 == 0 and (2 * C) % 128 == 0
            and (W // 2) >= 8)


def _fwd_stats_kernel(x2_r, s_r, q_r):
    f32 = jnp.float32
    xt = x2_r[:, 0].astype(f32)
    xb = x2_r[:, 1].astype(f32)
    C2 = s_r.shape[-1]
    s1 = jnp.sum(xt + xb, axis=(0, 1))
    q1 = jnp.sum(xt * xt + xb * xb, axis=(0, 1))
    s_r[0] = jnp.broadcast_to(s1, (8, C2))
    q_r[0] = jnp.broadcast_to(q1, (8, C2))


def _fwd_apply_kernel(x2_r, vec_r, p_r, mt_r, mb_r):
    """Normalize + ReLU + pool + routing masks, all in f32 on clean tiles.

    Masks are exact by construction: the pooled max and the comparisons
    live in the same f32 values, and p is rounded to the output dtype only
    at the final store (the rounding's gradient is identity, so routing on
    pre-rounding values is the true subgradient).
    """
    f32 = jnp.float32
    a = vec_r[0]
    b = vec_r[1]
    yt = jnp.maximum(x2_r[:, 0].astype(f32) * a + b, 0)
    yb = jnp.maximum(x2_r[:, 1].astype(f32) * a + b, 0)
    C = p_r.shape[-1]
    v = jnp.maximum(yt, yb)
    p = jnp.maximum(v[..., :C], v[..., C:])
    ph = jnp.concatenate([p, p], axis=-1)
    pos = ph > 0
    p_r[:] = p.astype(p_r.dtype)
    mt_r[:] = ((yt == ph) & pos).astype(mt_r.dtype)
    mb_r[:] = ((yb == ph) & pos).astype(mb_r.dtype)


def _fwd_pallas(x, gamma, beta, eps, interpret: bool):
    """Full Pallas forward: (p, mean, var, mt2, mb2).

    Two bandwidth-bound passes (stats partials; normalize+pool+masks) —
    the XLA formulation of the packed forward costs 3.06 ms at bs=16
    against flax's 1.17 ms because the [B,H,W,C] -> [...,2C] reshape
    crosses the lane dim and relayouts every operand.
    """
    B, H, W, C = x.shape
    M, Wp, C2 = B * (H // 2), W // 2, 2 * C
    n = B * H * W
    f32 = jnp.float32
    x2 = x.reshape(M, 2, Wp, C2)
    tb = _row_block(M, Wp, C2, jnp.dtype(x.dtype).itemsize)
    nb = M // tb

    x2_spec = pl.BlockSpec((tb, 2, Wp, C2), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, 8, C2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    sp, qp = pl.pallas_call(
        _fwd_stats_kernel,
        grid=(nb,),
        in_specs=[x2_spec],
        out_specs=[part_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((nb, 8, C2), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2)
    s2c = jnp.sum(sp[:, 0], axis=0)
    q2c = jnp.sum(qp[:, 0], axis=0)
    mean = (s2c[:C] + s2c[C:]) / n
    mean2 = (q2c[:C] + q2c[C:]) / n
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)

    inv = jax.lax.rsqrt(var + eps)
    a = gamma * inv
    b = beta - mean * a
    vec = jnp.stack([jnp.concatenate([a, a]), jnp.concatenate([b, b])])

    p3, mt3, mb3 = pl.pallas_call(
        _fwd_apply_kernel,
        grid=(nb,),
        in_specs=[x2_spec,
                  pl.BlockSpec((2, C2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((tb, Wp, C), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tb, Wp, C2), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tb, Wp, C2), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((M, Wp, C), x.dtype),
                   jax.ShapeDtypeStruct((M, Wp, C2), jnp.bfloat16),
                   jax.ShapeDtypeStruct((M, Wp, C2), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, vec)
    p = p3.reshape(B, H // 2, Wp, C)
    return p, mean, var, mt3.reshape(B, H // 2, Wp, C2), \
        mb3.reshape(B, H // 2, Wp, C2)


def _routed_g(x2_r, g_r, mt_r, mb_r):
    """Shared routing math on 3D ref slices (a live 4D size-2 axis makes
    Mosaic pick a vector layout with the size-2 dim minor, serializing
    every element op — slice the window-row axis at the ref level)."""
    f32 = jnp.float32
    C = g_r.shape[-1]
    mt = mt_r[:].astype(f32)   # [tb, Wp, 2C]
    mb = mb_r[:].astype(f32)
    cnt2 = mt + mb
    cnt = cnt2[..., :C] + cnt2[..., C:]
    gs = g_r[:].astype(f32) / jnp.maximum(cnt, 1.0)
    gh = jnp.concatenate([gs, gs], axis=-1)
    xt = x2_r[:, 0].astype(f32)
    xb = x2_r[:, 1].astype(f32)
    return mt * gh, mb * gh, xt, xb


def _bwd_reduce_kernel(x2_r, g_r, mt_r, mb_r, vec_r, s1_r, s2_r):
    dyt, dyb, xt, xb = _routed_g(x2_r, g_r, mt_r, mb_r)
    inv = vec_r[0]   # [2C]
    mu = vec_r[1]
    xht = (xt - mu) * inv
    xhb = (xb - mu) * inv
    # partial blocks are sublane-padded to 8 rows (min TPU tile); row 0 live
    C2 = s1_r.shape[-1]
    s1_r[0] = jnp.broadcast_to(jnp.sum(dyt + dyb, axis=(0, 1)), (8, C2))
    s2_r[0] = jnp.broadcast_to(
        jnp.sum(dyt * xht + dyb * xhb, axis=(0, 1)), (8, C2))


def _bwd_dx_kernel(n, x2_r, g_r, mt_r, mb_r, vec_r, dx_r):
    # vec_r packs [invp; meanp; gip; s1b; s2b; gmp; gvp] as [7, 2C] f32.
    dyt, dyb, xt, xb = _routed_g(x2_r, g_r, mt_r, mb_r)
    inv, mu, gip, s1b, s2b, gmp, gvp = (vec_r[i] for i in range(7))
    corr = s1b / n
    s2n = s2b / n
    base = gmp / n
    dxt = gip * (dyt - (corr + ((xt - mu) * inv) * s2n)) \
        + base + gvp * (2.0 / n) * (xt - mu)
    dxb = gip * (dyb - (corr + ((xb - mu) * inv) * s2n)) \
        + base + gvp * (2.0 / n) * (xb - mu)
    dx_r[:, 0] = dxt.astype(dx_r.dtype)
    dx_r[:, 1] = dxb.astype(dx_r.dtype)


def _row_block(M, Wp, C2, itemsize, budget=4 << 20):
    # bytes per packed row across all operands (x2 + g + masks + dx), x2
    row_bytes = Wp * (2 * C2 * itemsize * 2 + C2 // 2 * itemsize
                      + 2 * C2 * 2)
    tb = max(1, min(M, budget // max(row_bytes, 1)))
    while M % tb:
        tb -= 1
    return tb


def _bwd_pallas(x, gamma, mean, var, mt2, mb2, eps, gp, gmean, gvar,
                interpret: bool):
    B, H, W, C = x.shape
    M, Wp, C2 = B * (H // 2), W // 2, 2 * C
    n = float(B * H * W)
    f32 = jnp.float32

    x2 = x.reshape(M, 2, Wp, C2)          # free reinterpret
    g3 = gp.reshape(M, Wp, C)
    mt3 = mt2.reshape(M, Wp, C2)
    mb3 = mb2.reshape(M, Wp, C2)

    inv = jax.lax.rsqrt(var + eps)
    invp = jnp.concatenate([inv, inv])
    meanp = jnp.concatenate([mean, mean])

    tb = _row_block(M, Wp, C2, jnp.dtype(x.dtype).itemsize)
    nb = M // tb

    x2_spec = pl.BlockSpec((tb, 2, Wp, C2), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((tb, Wp, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((tb, Wp, C2), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    vec1 = jnp.stack([invp, meanp])  # [2, 2C]
    s1p, s2p = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=(nb,),
        in_specs=[x2_spec, g_spec, m_spec, m_spec,
                  pl.BlockSpec((2, C2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 8, C2), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nb, 8, C2), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, g3, mt3, mb3, vec1)
    s1b = jnp.sum(s1p[:, 0], axis=0)  # [2C]
    s2b = jnp.sum(s2p[:, 0], axis=0)
    s1 = s1b[:C] + s1b[C:]           # dbeta
    s2 = s2b[:C] + s2b[C:]           # dgamma
    s1f = jnp.concatenate([s1, s1])
    s2f = jnp.concatenate([s2, s2])

    gip = jnp.concatenate([gamma, gamma]) * invp
    gmp = jnp.concatenate([gmean, gmean])
    gvp = jnp.concatenate([gvar, gvar])
    vec2 = jnp.stack([invp, meanp, gip, s1f, s2f, gmp, gvp])  # [7, 2C]

    dx2 = pl.pallas_call(
        partial(_bwd_dx_kernel, n),
        grid=(nb,),
        in_specs=[x2_spec, g_spec, m_spec, m_spec,
                  pl.BlockSpec((7, C2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=x2_spec,
        out_shape=jax.ShapeDtypeStruct((M, 2, Wp, C2), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, g3, mt3, mb3, vec2)
    return dx2.reshape(B, H, W, C), s2, s1


# ----------------------------------------------------- mask-residual XLA path
# Natural-layout variant: no packing, no Pallas, no relayouts.  The forward
# stashes the pool routing mask (computed in the same XLA program as the
# pooled output, so equality routing is exact); the backward is then pure
# elementwise+reduce work that XLA fuses with the BatchNorm backward —
# SelectAndScatter never appears.  Tie semantics: every max-equal position
# receives the full window cotangent (no even split — a tied window's
# gradient is double-routed).  Ties are measure-zero on continuous data;
# use backend="xla" if exact tie splitting matters.


def _up2_b(p, H, W):
    B, Hp, Wp, C = p.shape
    u = jnp.broadcast_to(p[:, :, None, :, None, :], (B, Hp, 2, Wp, 2, C))
    return u.reshape(B, 2 * Hp, 2 * Wp, C)[:, :H, :W]


def _fwd_mask(x, a, b, ceil):
    B, H, W, C = x.shape
    y = jnp.maximum(x * a + b, 0)
    p = _pool_max(y, ceil)
    u = _up2_b(p, H, W)
    m = ((y == u) & (u > 0)).astype(x.dtype)
    return p, m


def _bwd_mask(x, gamma, mean, var, m, eps, gp, gmean, gvar):
    B, H, W, C = x.shape
    n = B * H * W
    f32 = jnp.float32
    dy = m.astype(f32) * _up2_b(gp.astype(f32), H, W)
    inv = jax.lax.rsqrt(var + eps)
    xf = x.astype(f32)
    xhat = (xf - mean) * inv
    s1 = jnp.sum(dy, axis=(0, 1, 2))
    s2 = jnp.sum(dy * xhat, axis=(0, 1, 2))
    dx = (gamma * inv) * (dy - (s1 + xhat * s2) / n)
    dx = dx + gmean / n + gvar * (2.0 / n) * (xf - mean)
    return dx.astype(x.dtype), s2, s1


# ------------------------------------------------------------------ public op


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def bn_relu_pool(x, gamma, beta, eps: float = 1e-5, ceil: bool = False,
                 tie_split: bool = True, backend: str = "auto"):
    """Train-mode BN + ReLU + 2x2/2 maxpool on NHWC ``x``.

    Returns ``(pooled, mean, var)``; mean/var are the float32 biased batch
    statistics for the caller's running-average update.

    ``backend`` picks the implementation: "xla" (packed forward, recompute
    VJP), "pallas" (fused four-pass Pallas forward+backward, tie_split
    semantics only), "pallas_interpret" (tests), or "auto" (pallas on TPU
    when the shape supports it).
    """
    if _use_pallas(backend, x.shape, tie_split):
        p, mean, var, _, _ = _fwd_pallas(x, gamma, beta, eps,
                                         backend == "pallas_interpret")
        return p, mean, var
    mean, var = _stats(x)
    a, b = _affine(gamma, beta, mean, var, eps, x.dtype)
    if _packable(x.shape) and backend != "xla_mask":
        return _fwd_packed_out(x, a, b), mean, var
    y = jnp.maximum(x * a + b, 0)
    return _pool_max(y, ceil), mean, var


def _use_pallas(backend: str, shape, tie_split: bool) -> bool:
    if not tie_split or not _pallas_ok(shape):
        return False
    if backend == "auto":
        return jax.default_backend() not in ("cpu",)
    return backend.startswith("pallas")


def _fwd(x, gamma, beta, eps, ceil, tie_split, backend):
    if _use_pallas(backend, x.shape, tie_split):
        p, mean, var, mt2, mb2 = _fwd_pallas(x, gamma, beta, eps,
                                             backend == "pallas_interpret")
        return (p, mean, var), (x, gamma, beta, mean, var, (mt2, mb2))
    mean, var = _stats(x)
    a, b = _affine(gamma, beta, mean, var, eps, x.dtype)
    if backend == "xla_mask":
        p, m = _fwd_mask(x, a, b, ceil)
        return (p, mean, var), (x, gamma, beta, mean, var, (m,))
    if _packable(x.shape):
        p = _fwd_packed_out(x, a, b)
    else:
        p = _pool_max(jnp.maximum(x * a + b, 0), ceil)
    return (p, mean, var), (x, gamma, beta, mean, var, None)


def _bwd(eps, ceil, tie_split, backend, res, cts):
    x, gamma, beta, mean, var, masks = res
    gp, gmean, gvar = cts
    if masks is not None and len(masks) == 2:
        return _bwd_pallas(x, gamma, mean, var, masks[0], masks[1], eps,
                           gp, gmean, gvar,
                           interpret=backend == "pallas_interpret")
    if masks is not None:
        return _bwd_mask(x, gamma, mean, var, masks[0], eps, gp, gmean, gvar)
    if _packable(x.shape):
        return _bwd_packed(x, gamma, beta, mean, var, eps, tie_split,
                           gp, gmean, gvar)
    return _bwd_general(x, gamma, beta, mean, var, eps, ceil, tie_split,
                        gp, gmean, gvar)


bn_relu_pool.defvjp(_fwd, _bwd)
