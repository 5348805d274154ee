"""Fused train-mode BatchNorm + ReLU + 2x2 maxpool with a recompute VJP.

Why: in the bs=16 train step the stem's ``BN -> ReLU -> maxpool`` tail is
~5.3 ms of the 12.9 ms stem fwd+bwd (scripts/stem_train_experiments.py), and
~3.9 ms of that is XLA's SelectAndScatter pool backward — a windowed scatter
the TPU backend runs far below HBM speed-of-light.  The reference leans on
cuDNN's fused BN/pool kernels for the same structure (torch BatchNorm2d +
MaxPool2d, SSD_from_scratch.py:52-60); this module is the TPU-native
equivalent, built so XLA fuses everything into a few HBM-speed passes:

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


# ------------------------------------------------------------------ public op


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bn_relu_pool(x, gamma, beta, eps: float = 1e-5, ceil: bool = False,
                 tie_split: bool = True):
    """Train-mode BN + ReLU + 2x2/2 maxpool on NHWC ``x``.

    Returns ``(pooled, mean, var)``; mean/var are the float32 biased batch
    statistics for the caller's running-average update.
    """
    mean, var = _stats(x)
    a, b = _affine(gamma, beta, mean, var, eps, x.dtype)
    if _packable(x.shape):
        return _fwd_packed_out(x, a, b), mean, var
    y = jnp.maximum(x * a + b, 0)
    return _pool_max(y, ceil), mean, var


def _fwd(x, gamma, beta, eps, ceil, tie_split):
    out = bn_relu_pool(x, gamma, beta, eps, ceil, tie_split)
    _, mean, var = out
    return out, (x, gamma, beta, mean, var)


def _bwd(eps, ceil, tie_split, res, cts):
    x, gamma, beta, mean, var = res
    gp, gmean, gvar = cts
    if _packable(x.shape):
        return _bwd_packed(x, gamma, beta, mean, var, eps, tie_split,
                           gp, gmean, gvar)
    return _bwd_general(x, gamma, beta, mean, var, eps, ceil, tie_split,
                        gp, gmean, gvar)


bn_relu_pool.defvjp(_fwd, _bwd)
