"""2x2/2 max pool with an XLA pair-packed forward and a Pallas backward.

STATUS — measured, NOT wired into the model path.  Standalone the Pallas
backward wins (1.09 vs 1.73 ms/iter for XLA pool fwd+bwd, bs=16 bf16),
but inside the full BN+ReLU+pool tail it LOSES (7.7 vs 5.6 ms/iter,
interleaved same-process TPU A/B): the custom_vjp boundary stops XLA
from fusing the BatchNorm backward with the pool routing, and the
packed-view reshape relayouts x/dy at the kernel boundary.  See
ssdx/ops/fused_bn_pool.py for the follow-up that fused the BN backward
into the kernels too (parity, not a win).  Kept as a tested standalone
op; prefer flax ``nn.max_pool`` in composed training graphs.

The reference's stem runs torch ``MaxPool2d`` (SSD_from_scratch.py:56-60);
on TPU the XLA equivalents are the measured train-step hotspot at bs=16
(scripts/stem_train_experiments.py, [16,300,300,64] bf16):

* forward ``lax.reduce_window``: 2.1 ms — the window reduction is lowered
  generically; a pair-packed reshape form (vertical max of the two row
  slabs of ``[B,H/2,2,W/2,2C]``, then a max of the two C-lane halves) does
  the same pool in 0.72 ms with clean (W/2, 2C) = (sublane, lane) tiles.
* backward ``SelectAndScatter``: ~3.9 ms of the 4.5 ms pool fwd+bwd — a
  windowed scatter the TPU backend runs far below HBM speed-of-light, and
  the reason the earlier eq-mask XLA rewrite was tried (it won standalone
  but regressed in-program, ROADMAP gap #4: XLA re-fused SelectAndScatter
  into the surrounding BN backward and the eq-mask recompute broke that).
  Here the backward is ONE Pallas map kernel — read ``y`` (the pool input,
  a residual XLA keeps anyway), ``p`` (pooled output), and the cotangent,
  write ``dy`` — so its pass structure cannot be de-optimized: ~460 MB of
  traffic against SelectAndScatter's multi-pass scatter.

Tie semantics: gradient of a window is split evenly among positions equal
to the max (``jnp.max`` autodiff convention; torch routes to the first).

Only even H/W run the fused path (`ceil`/odd shapes fall back to
``flax.linen.max_pool``); channels must tile 2C onto 128 lanes cleanly or
the fallback is used as well.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["max_pool_2x2"]


def _supported(shape) -> bool:
    B, H, W, C = shape
    return H % 2 == 0 and W % 2 == 0 and (2 * C) % 128 == 0 and (W // 2) >= 8


def _pool_fwd_packed(y):
    B, H, W, C = y.shape
    y2 = y.reshape(B, H // 2, 2, W // 2, 2 * C)
    v = jnp.maximum(y2[:, :, 0], y2[:, :, 1])
    return jnp.maximum(v[..., :C], v[..., C:])


def _bwd_kernel(y2_ref, p_ref, g_ref, dy_ref):
    # All compute on 3D [TB, Wp, 2C] slabs: a 4D load keeps the size-2
    # window axis live and Mosaic picks a vector<8x128x2> layout (size-2 dim
    # minor) that serializes every element op. Slicing the refs first keeps
    # operands on clean (Wp, 2C) = (sublane, lane) tiles.
    yt = y2_ref[:, 0].astype(jnp.float32)  # [TB, Wp, 2C] top rows
    yb = y2_ref[:, 1].astype(jnp.float32)  # bottom rows
    p = p_ref[:]    # [TB, Wp, C]
    g = g_ref[:]    # [TB, Wp, C]
    # compare in f32: Mosaic on v5e rejects bf16 cmpf eq (exact either way —
    # every bf16 value is representable in f32)
    ph = jnp.concatenate([p, p], axis=-1).astype(jnp.float32)  # [TB, Wp, 2C]
    mt = yt == ph
    mb = yb == ph
    # even tie split: count max-equal positions per window
    cnt2 = mt.astype(jnp.float32) + mb.astype(jnp.float32)  # [TB, Wp, 2C]
    C = p.shape[-1]
    cnt = cnt2[..., :C] + cnt2[..., C:]  # [TB, Wp, C]
    gs = g.astype(jnp.float32) / jnp.maximum(cnt, 1.0)
    gh = jnp.concatenate([gs, gs], axis=-1)
    zero = jnp.zeros((), jnp.float32)
    dy_ref[:, 0] = jnp.where(mt, gh, zero).astype(g.dtype)
    dy_ref[:, 1] = jnp.where(mb, gh, zero).astype(g.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pool_bwd_pallas(y, p, g, interpret: bool):
    B, H, W, C = y.shape
    M, Wp = B * (H // 2), W // 2
    y2 = y.reshape(M, 2, Wp, 2 * C)
    p3 = p.reshape(M, Wp, C)
    g3 = g.reshape(M, Wp, C)
    # Block rows: bound the VMEM working set to ~4-5 MB.
    itemsize = jnp.dtype(y.dtype).itemsize
    row_bytes = (2 * Wp * 2 * C + 2 * Wp * C + Wp * C) * itemsize * 2
    tb = max(1, min(M, (4 << 20) // row_bytes))
    while M % tb:
        tb -= 1
    dy2 = pl.pallas_call(
        _bwd_kernel,
        grid=(M // tb,),
        in_specs=[
            pl.BlockSpec((tb, 2, Wp, 2 * C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Wp, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Wp, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 2, Wp, 2 * C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 2, Wp, 2 * C), g.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(y2, p3, g3)
    return dy2.reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x2(y, interpret: bool | None = None):
    """2x2 stride-2 max pool on NHWC ``y`` (even H, W) with Pallas backward.

    ``interpret`` defaults to True off-TPU (tests/CPU) and False on TPU.
    """
    if not _supported(y.shape):
        return nn.max_pool(y, (2, 2), strides=(2, 2))
    return _pool_fwd_packed(y)


def _fwd(y, interpret):
    p = max_pool_2x2(y, interpret)
    return p, (y, p)


def _bwd(interpret, res, gp):
    y, p = res
    if not _supported(y.shape):
        # mirror the forward fallback's own gradient
        _, vjp = jax.vjp(lambda t: nn.max_pool(t, (2, 2), strides=(2, 2)), y)
        return (vjp(gp)[0],)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return (_pool_bwd_pallas(y, p, gp, interpret),)


max_pool_2x2.defvjp(_fwd, _bwd)
