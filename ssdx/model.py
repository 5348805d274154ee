"""SSD300 detector network: VGG16+BN backbone, extra layers, multibox heads.

TPU-native redesign of the reference network (``mySSD``,
SSD_from_scratch.py:14-271):

* NHWC layout end to end — on TPU, XLA tiles NHWC convs straight onto the MXU
  and the head outputs are already channel-last, so the reference's
  NCHW->NHWC ``permute(0,2,3,1).contiguous()`` shuffles (SSD_from_scratch.py:
  249-262) disappear entirely; flattening a head tap is a free ``reshape``.
* Functional: parameters/batch-stats are pytrees; ``apply`` is pure and
  jit/pjit/vmap-friendly.
* Mixed precision: ``dtype`` controls activation/compute precision
  (bfloat16 recommended on TPU); parameters and BatchNorm statistics stay in
  float32; head outputs are returned in float32 for stable loss/softmax.

Architecture parity (shapes as annotated in the reference):
  conv1(2x64) mp conv2(2x128) mp conv3(3x256) mp[ceil] conv4(3x512) -> tap 38x38x512
  mp conv5(3x512) conv6(3x3 d6 1024) conv7(1x1 1024)               -> tap 19x19x1024
  conv8_2 (1x1 256, 3x3 s2 512)                                    -> tap 10x10x512
  conv9_2 (1x1 128, 3x3 s2 256)                                    -> tap 5x5x256
  conv10_2(1x1 128, 3x3 v 256; no BN on 3x3)                       -> tap 3x3x256
  conv11_2(1x1 128, 3x3 v 256; no BN at all)                       -> tap 1x1x256
  (BatchNorm follows every conv except where the reference omits it:
   SSD_from_scratch.py:193-209.)

Heads: per level k in (4,6,6,6,4,4) anchors/location; box head emits k*4
channels, class head k*num_classes; flattened in (H, W, k) order to match the
prior ordering of ssdx/priors.py.  Total priors: 8732.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .priors import BOXES_PER_LOCATION, NUM_PRIORS

__all__ = ["SSD300", "IMAGE_SIZE"]

IMAGE_SIZE = 300

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class ConvBNRelu(nn.Module):
    """Conv (+ optional BatchNorm) + ReLU.  BN statistics kept in float32."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dilation: tuple[int, int] = (1, 1)
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            kernel_dilation=self.dilation,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_conv_init,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch BatchNorm2d momentum=0.1 convention
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        return nn.relu(x)


class _HeadParams(nn.Module):
    """Bare conv parameters for one multibox head.

    Declares the same ``kernel``/``bias`` tree as the ``nn.Conv`` it replaces
    (so checkpoints and the folded/quantized exporters are unchanged) but
    returns the parameters instead of applying them: the caller concatenates
    the box and class kernels along cout and runs ONE conv per tap.  The two
    separate head convs each pad their small cout (k*4 = 16-24, k*C = 24-36
    lanes) to the MXU's 128-lane tile; fusing them halves the number of
    padded MXU passes (measured 0.65 -> 0.37 ms over the six taps at bs=32
    on v5e, scripts/bench_int8_conv.py --stages).  Numerics are unchanged:
    output channels of a conv are independent columns of the contraction.
    """

    features: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", _conv_init, (3, 3, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


def _max_pool(x, ceil: bool = False):
    """2x2/2 max pool; ``ceil`` pads the bottom/right edge with -inf so odd
    extents round up (reference mp3 ceil_mode=True, SSD_from_scratch.py:104)."""
    pad = ((0, 1), (0, 1)) if ceil else ((0, 0), (0, 0))
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding=pad)


class SSD300(nn.Module):
    """SSD300 with VGG16+BN backbone.

    ``__call__(x[B,300,300,3], train)`` returns
    ``(loc [B,8732,4] float32, cls [B,8732,num_classes] float32)``.

    ``fold_bn=True`` builds the BN-free serving variant whose parameters come
    from :func:`ssdx.export.fold_batchnorm` (inference only).

    ``stem_input=True`` makes ``__call__`` accept the post-stem feature map
    ``[B,150,150,64]`` instead of images — the first two convs + maxpool are
    expected to have been computed externally by the fused Pallas stem
    kernel (:func:`ssdx.ops.pallas_stem.stem_conv_pool`).  The two stem
    ConvBNRelu modules are still *constructed* (never called) so flax
    auto-numbering of all later modules — and therefore the parameter tree
    the folded weights use — is unchanged; flax ignores their unused params
    at apply time.

    ``width_mult`` scales every backbone/extra channel count (rounded to a
    multiple of 8, min 8) while keeping the exact layer structure, taps,
    and 8732-prior head contract.  width_mult < 1 exists for fast tests and
    experiments — XLA:CPU compile time of the full-width fwd+bwd dominates
    the test suite — and is NOT the reference architecture (that is
    width_mult=1.0 only).
    """

    num_classes: int  # including background (reference: len(class_to_idx)+1)
    dtype: Any = jnp.float32
    fold_bn: bool = False
    stem_input: bool = False
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        wm = lambda f: max(8, int(f * self.width_mult) // 8 * 8)
        cbr = lambda f, use_bn=True, **kw: ConvBNRelu(
            wm(f), dtype=dt, use_bn=use_bn and not self.fold_bn, **kw
        )

        # ---- VGG16 up to conv4_3 ----
        stem = [cbr(64), cbr(64)]  # constructed even when skipped (naming)
        if not self.stem_input:
            for layer in stem:
                x = layer(x, train)
            x = _max_pool(x)  # 300 -> 150
        for _ in range(2):
            x = cbr(128)(x, train)
        x = _max_pool(x)  # 150 -> 75
        for _ in range(3):
            x = cbr(256)(x, train)
        x = _max_pool(x, ceil=True)  # 75 -> 38
        for _ in range(3):
            x = cbr(512)(x, train)
        tap4_3 = x  # [B, 38, 38, 512]

        # ---- VGG extras (mp4 + conv5) ----
        x = _max_pool(x)  # 38 -> 19
        for _ in range(3):
            x = cbr(512)(x, train)

        # ---- SSD extra layers ----
        x = cbr(1024, padding=((6, 6), (6, 6)), dilation=(6, 6))(x, train)  # conv6
        x = cbr(1024, kernel=(1, 1), padding="VALID")(x, train)  # conv7
        tap7 = x  # [B, 19, 19, 1024]

        x = cbr(256, kernel=(1, 1), padding="VALID")(x, train)
        x = cbr(512, strides=(2, 2), padding=((1, 1), (1, 1)))(x, train)
        tap8 = x  # [B, 10, 10, 512]

        x = cbr(128, kernel=(1, 1), padding="VALID")(x, train)
        x = cbr(256, strides=(2, 2), padding=((1, 1), (1, 1)))(x, train)
        tap9 = x  # [B, 5, 5, 256]

        x = cbr(128, kernel=(1, 1), padding="VALID")(x, train)
        x = cbr(256, padding="VALID", use_bn=False)(x, train)
        tap10 = x  # [B, 3, 3, 256]

        x = cbr(128, kernel=(1, 1), padding="VALID", use_bn=False)(x, train)
        x = cbr(256, padding="VALID", use_bn=False)(x, train)
        tap11 = x  # [B, 1, 1, 256]

        taps: Sequence[jnp.ndarray] = (tap4_3, tap7, tap8, tap9, tap10, tap11)

        # ---- multibox heads ----
        # One fused conv per tap: the box and class kernels are concatenated
        # along cout so each tap pays the MXU's 128-lane cout padding once
        # instead of twice (see _HeadParams).  The parameter tree is the same
        # two-conv layout as the reference heads (SSD_from_scratch.py:213-229).
        B = x.shape[0]
        locs, clss = [], []
        for i, (t, k) in enumerate(zip(taps, BOXES_PER_LOCATION)):
            cin = t.shape[-1]
            kl, bl = _HeadParams(k * 4, name=f"box_head_{i}")(cin)
            kc, bc = _HeadParams(k * self.num_classes, name=f"cls_head_{i}")(cin)
            y = jax.lax.conv_general_dilated(
                t.astype(dt),
                jnp.concatenate([kl, kc], axis=-1).astype(dt),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.concatenate([bl, bc]).astype(dt)
            loc, cls = jnp.split(y, [k * 4], axis=-1)
            # NHWC: flatten (H, W, k) -> priors axis directly; matches prior
            # ordering level->row->col->k from ssdx.priors.create_priors.
            locs.append(loc.reshape(B, -1, 4))
            clss.append(cls.reshape(B, -1, self.num_classes))

        loc_out = jnp.concatenate(locs, axis=1).astype(jnp.float32)
        cls_out = jnp.concatenate(clss, axis=1).astype(jnp.float32)
        assert loc_out.shape[1] == NUM_PRIORS, loc_out.shape
        return loc_out, cls_out

    def init_variables(self, rng: jax.Array, batch_size: int = 1):
        """Initialize {'params', 'batch_stats'} for a [B,300,300,3] input."""
        dummy = jnp.zeros((batch_size, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
        return self.init(rng, dummy, train=False)
