"""Int8 post-training quantization for the serving path.

TPU v5e's MXU runs int8 matmuls/convolutions at twice the bf16 rate (and
int8 activations halve HBM traffic), so a quantized backbone is the natural
TPU-native serving mode for a FLOP-dominated detector.  The reference has no
quantization story (it serves eval-mode float32 torch on Cloud Run,
app_files/ssd_demo_app.py:26-36); this module adds one without changing the
model contract:

* **Scheme**: symmetric int8 with **per-input-channel activation scales
  folded into the weights**.  Post-ReLU conv activations have wildly
  uneven per-channel ranges; a per-tensor scale wastes most of the int8
  grid on the quiet channels (measured: 18/23 detection agreement on the
  bundled scenes).  Instead each layer calibrates ``a[c] = amax|x[..., c]|``
  and quantizes ``x_q[c] = round(x[c] / s_x[c])``, ``s_x[c] = a[c]/127``.
  The channel scale cannot ride through the contraction at runtime, so it
  is folded into the next conv's weights *before* weight quantization:
  ``Wf[..., cin, cout] = W * s_x[cin]``, then per-output-channel weight
  scales ``s_w[cout] = amax|Wf[..., cout]| / 127``.  The int8 conv then
  yields ``y = (x_q ⊛ W_q) * s_w[cout] + bias`` exactly as in the
  per-tensor scheme — same MXU int8 x int8 -> int32 compute
  (``preferred_element_type=int32``), same single elementwise epilogue
  (dequant + bias + ReLU + requant), which XLA fuses, so inter-layer
  activations live in HBM as int8.  Measured on the bundled demo scenes:
  21/23 detection agreement vs bf16 (amax per-tensor: 18/23; quantile
  calibration at q=0.9999/0.999 measured 19/16 — clipping loses more than
  it wins here, so calibration stays amax).
* **Scope**: the post-stem backbone (ConvBNRelu_2..22 of ssdx/model.py —
  the FLOP mass).  The stem stays bf16 (it is served by the fused Pallas
  kernel, ssdx/ops/pallas_stem.py, and its 3-channel input quantizes
  poorly); the multibox heads stay bf16 (score/box fidelity, and they are
  a small fraction of the FLOPs).  Max-pools run directly on int8 (max
  commutes with a positive scale).
* **Inputs**: BN-folded parameters (ssdx/export.fold_batchnorm) — the same
  serving transform the bf16 path uses, so quantization composes with the
  existing export pipeline.

Accuracy is use-case dependent; measure it with ``detection_agreement``
(below) or a real mAP eval before deploying.  Everything here is static
shapes + static scales: one compiled program, no dynamic requantization.

**Measured status on the current TPU toolchain.**  The *XLA* lowering in
this environment does NOT route int8 GEMMs to the MXU: a 2048x1024x1024
``lax.dot(int8, int8) -> int32`` measured 4,358 ms vs 4.3 ms bf16 (about
1000x slower — scalar VPU code), and an [8,150,150,64]x[3,3,64,128] int8
conv 143 ms vs 6.8 ms bf16.  The *Pallas/Mosaic* compiler DOES route int8
to the MXU (264 TF/s on a tiled int8 matmul vs 191 TF/s peak XLA bf16 —
scripts/bench_int8_mxu.py), so on TPU the int8 backbone runs as Pallas
kernels (ssdx/ops/pallas_int8_conv.py; per-layer up to 2.2x the bf16
conv, 420 TF/s peak) and ``apply_int8`` here is the XLA oracle those
kernels are tested against (and the CPU path).  Serving keeps bf16 as the
default and ``SSDX_INT8=1`` is opt-in; see pallas_int8_conv.py for the
current end-to-end numbers.

Architecture parity references: the layer topology mirrors ``mySSD``
(reference SSD_from_scratch.py:46-271) exactly as ssdx/model.py builds it;
tap points and head flattening match ssdx/model.py:144-196.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .priors import BOXES_PER_LOCATION, NUM_PRIORS

__all__ = [
    "QuantizedSSD",
    "calibrate_act_scales",
    "quantize_ssd",
    "apply_int8",
    "stem_bf16",
    "detection_agreement",
]

_DN = ("NHWC", "HWIO", "NHWC")
_I8_MIN, _I8_MAX = -127, 127  # symmetric: keep -128 unused


class _L(NamedTuple):
    name: str
    kernel: tuple[int, int]
    stride: int
    padding: Any
    dilation: int
    tap: int | None  # tap index (taken after ReLU, before any pool)
    pool: str | None  # None | "std" | "ceil" (applied after the tap)


# Post-stem topology of SSD300 (ssdx/model.py:136-170); input [B,150,150,64].
_TOPOLOGY: tuple[_L, ...] = (
    _L("ConvBNRelu_2", (3, 3), 1, "SAME", 1, None, None),
    _L("ConvBNRelu_3", (3, 3), 1, "SAME", 1, None, "std"),  # 150 -> 75
    _L("ConvBNRelu_4", (3, 3), 1, "SAME", 1, None, None),
    _L("ConvBNRelu_5", (3, 3), 1, "SAME", 1, None, None),
    _L("ConvBNRelu_6", (3, 3), 1, "SAME", 1, None, "ceil"),  # 75 -> 38
    _L("ConvBNRelu_7", (3, 3), 1, "SAME", 1, None, None),
    _L("ConvBNRelu_8", (3, 3), 1, "SAME", 1, None, None),
    _L("ConvBNRelu_9", (3, 3), 1, "SAME", 1, 0, "std"),  # tap4_3; 38 -> 19
    _L("ConvBNRelu_10", (3, 3), 1, "SAME", 1, None, None),
    _L("ConvBNRelu_11", (3, 3), 1, "SAME", 1, None, None),
    _L("ConvBNRelu_12", (3, 3), 1, "SAME", 1, None, None),
    _L("ConvBNRelu_13", (3, 3), 1, ((6, 6), (6, 6)), 6, None, None),  # conv6 d6
    _L("ConvBNRelu_14", (1, 1), 1, "VALID", 1, 1, None),  # tap7
    _L("ConvBNRelu_15", (1, 1), 1, "VALID", 1, None, None),
    _L("ConvBNRelu_16", (3, 3), 2, ((1, 1), (1, 1)), 1, 2, None),  # tap8
    _L("ConvBNRelu_17", (1, 1), 1, "VALID", 1, None, None),
    _L("ConvBNRelu_18", (3, 3), 2, ((1, 1), (1, 1)), 1, 3, None),  # tap9
    _L("ConvBNRelu_19", (1, 1), 1, "VALID", 1, None, None),
    _L("ConvBNRelu_20", (3, 3), 1, "VALID", 1, 4, None),  # tap10
    _L("ConvBNRelu_21", (1, 1), 1, "VALID", 1, None, None),
    _L("ConvBNRelu_22", (3, 3), 1, "VALID", 1, 5, None),  # tap11
)


class QuantLayer(NamedTuple):
    kernel_q: jnp.ndarray  # [kh, kw, cin, cout] int8 (input scales pre-folded)
    bias: jnp.ndarray  # [cout] float32
    in_scale: jnp.ndarray  # [cin] float32 — per-channel scale of the int8 input
    w_scale: jnp.ndarray  # [cout] float32 — scale of the folded weight


class QuantizedSSD(NamedTuple):
    """Pytree of the quantized serving network (post-stem)."""

    layers: dict  # name -> QuantLayer (int8 backbone)
    heads: dict  # name -> {"kernel","bias"} float32 (bf16 compute)
    num_classes: int


def _conv(x, kernel, spec: _L, preferred):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, _DN)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (spec.stride, spec.stride),
        spec.padding,
        rhs_dilation=(spec.dilation, spec.dilation),
        dimension_numbers=dn,
        preferred_element_type=preferred,
    )


def _max_pool(x, ceil: bool):
    """2x2/2 max pool on any dtype (int8 included — max commutes with the
    positive quantization scale).  ``ceil`` pads bottom/right with the dtype
    identity so odd extents round up (reference mp3 ceil_mode)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        init = jnp.iinfo(x.dtype).min
    else:
        init = -jnp.inf
    pad = (0, 1) if ceil else (0, 0)
    return jax.lax.reduce_window(
        x,
        jnp.asarray(init, x.dtype),
        jax.lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        ((0, 0), pad, pad, (0, 0)),
    )


# ------------------------------------------------------------------ bf16 stem


def stem_bf16(params: dict, images: jnp.ndarray, dtype=jnp.bfloat16):
    """XLA fallback stem on BN-folded params: conv1_1+ReLU, conv1_2+ReLU,
    2x2 maxpool — [B,300,300,3] -> [B,150,150,64].  The TPU serving path
    uses the fused Pallas kernel instead (ssdx/ops/pallas_stem.py)."""
    x = images.astype(dtype)
    for name in ("ConvBNRelu_0", "ConvBNRelu_1"):
        c = params[name]["Conv_0"]
        spec = _L(name, (3, 3), 1, "SAME", 1, None, None)
        x = _conv(x, jnp.asarray(c["kernel"], dtype), spec, dtype)
        x = jax.nn.relu(x + jnp.asarray(c["bias"], dtype))
    return _max_pool(x, ceil=False)


# ----------------------------------------------------------------- calibration


def calibrate_act_scales(params: dict, feats: jnp.ndarray, dtype=jnp.bfloat16):
    """One calibration pass: run the bf16 post-stem backbone on ``feats``
    [B,150,150,64] and return {layer_name: per-channel amax [cin]} of each
    conv's input (numpy float32, host).  Call per batch and fold with
    ``np.maximum`` for multi-batch calibration."""
    import numpy as np

    @jax.jit
    def walk(feats):
        amaxes = {}
        x = feats.astype(dtype)
        for spec in _TOPOLOGY:
            amaxes[spec.name] = jnp.max(
                jnp.abs(x), axis=(0, 1, 2)
            ).astype(jnp.float32)
            c = params[spec.name]["Conv_0"]
            x = _conv(x, jnp.asarray(c["kernel"], dtype), spec, dtype)
            x = jax.nn.relu(x + jnp.asarray(c["bias"], dtype))
            if spec.pool:
                x = _max_pool(x, ceil=spec.pool == "ceil")
        return amaxes

    return {k: np.asarray(v, np.float32) for k, v in walk(feats).items()}


def quantize_ssd(
    params: dict, act_scales: dict[str, float], num_classes: int
) -> QuantizedSSD:
    """Quantize BN-folded SSD300 params to the int8 serving form.

    ``act_scales``: per-layer per-channel input amax [cin] from
    :func:`calibrate_act_scales` (possibly ``np.maximum``-ed over several
    batches).  Each layer's per-channel activation scale is folded into its
    kernel before weight quantization (module docstring, "Scheme").
    """
    layers = {}
    for spec in _TOPOLOGY:
        c = params[spec.name]["Conv_0"]
        w = jnp.asarray(c["kernel"], jnp.float32)
        in_scale = (
            jnp.maximum(jnp.asarray(act_scales[spec.name], jnp.float32), 1e-12)
            / _I8_MAX
        )
        wf = w * in_scale[None, None, :, None]  # fold act scales into weights
        w_amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-30)
        w_scale = w_amax / _I8_MAX
        kernel_q = jnp.clip(jnp.round(wf / w_scale), _I8_MIN, _I8_MAX).astype(
            jnp.int8
        )
        layers[spec.name] = QuantLayer(
            kernel_q=kernel_q,
            bias=jnp.asarray(c["bias"], jnp.float32),
            in_scale=in_scale,
            w_scale=w_scale,
        )
    heads = {}
    for i in range(6):
        for h in ("box_head_", "cls_head_"):
            name = f"{h}{i}"
            heads[name] = {
                "kernel": jnp.asarray(params[name]["kernel"], jnp.float32),
                "bias": jnp.asarray(params[name]["bias"], jnp.float32),
            }
    return QuantizedSSD(layers=layers, heads=heads, num_classes=num_classes)


# -------------------------------------------------------------- int8 forward


def _quantize_act(x, scale):
    return jnp.clip(jnp.round(x / scale), _I8_MIN, _I8_MAX).astype(jnp.int8)


def apply_int8(
    qp: QuantizedSSD, feats: jnp.ndarray, head_dtype=jnp.bfloat16,
    compute: str = "auto",
):
    """Int8 post-stem forward: feats [B,150,150,64] (bf16/f32, from the stem)
    -> (loc [B,8732,4] f32, cls [B,8732,C] f32).

    Same tap points, head convs, and (H, W, k) flattening as
    ssdx/model.py:144-196 — only the arithmetic of ConvBNRelu_2..22 is
    int8.  Each layer: int8 conv -> int32, then one fused elementwise
    epilogue (dequant + bias + ReLU [+ tap emit] + requant to the next
    layer's scale); pools run on the int8 tensor.

    ``compute``: "int32" contracts int8 x int8 -> int32 — the exact
    integer semantics the Pallas MXU kernels are oracle-tested against.
    "f32" casts the int8 operands to f32 and rounds the conv output —
    XLA:CPU lowers integer convs to scalar code (measured ~50x slower
    than its vectorized f32 conv at conv3 shape), so this is the CPU
    serving/test route.  f32 accumulation of the integer products is
    exact while partial sums stay within the 24-bit mantissa; the deepest
    layers' worst-case bound exceeds that, so the result is not *proven*
    bitwise (measured bitwise-equal on worst-case random int8 data and on
    the calibrated demo weights; any residual difference is one int32
    step, invisible after the f32 dequant epilogue).  "auto" picks "f32"
    on CPU backends, "int32" elsewhere.
    """
    if compute == "auto":
        compute = "f32" if jax.default_backend() == "cpu" else "int32"

    def conv_q(xq, kernel_q, spec):
        if compute == "f32":
            y = _conv(xq.astype(jnp.float32), kernel_q.astype(jnp.float32),
                      spec, jnp.float32)
            return jnp.round(y)
        return _conv(xq, kernel_q, spec, jnp.int32)

    taps: list[jnp.ndarray | None] = [None] * 6
    first = qp.layers[_TOPOLOGY[0].name]
    xq = _quantize_act(feats.astype(jnp.float32), first.in_scale)
    for i, spec in enumerate(_TOPOLOGY):
        ql = qp.layers[spec.name]
        y32 = conv_q(xq, ql.kernel_q, spec)
        # in_scale is folded into kernel_q; w_scale alone dequantizes
        y = y32.astype(jnp.float32) * ql.w_scale + ql.bias
        y = jax.nn.relu(y)
        if spec.tap is not None:
            taps[spec.tap] = y.astype(head_dtype)
        nxt = _TOPOLOGY[i + 1] if i + 1 < len(_TOPOLOGY) else None
        if nxt is not None:
            xq = _quantize_act(y, qp.layers[nxt.name].in_scale)
            if spec.pool:
                xq = _max_pool(xq, ceil=spec.pool == "ceil")

    B = feats.shape[0]
    locs, clss = [], []
    head_spec = _L("head", (3, 3), 1, "SAME", 1, None, None)
    for i, (t, k) in enumerate(zip(taps, BOXES_PER_LOCATION)):
        for h, width, outs in (
            ("box_head_", 4, locs),
            ("cls_head_", qp.num_classes, clss),
        ):
            hp = qp.heads[f"{h}{i}"]
            y = _conv(t, hp["kernel"].astype(head_dtype), head_spec, head_dtype)
            y = y + hp["bias"].astype(head_dtype)
            outs.append(y.reshape(B, -1, width))
    loc_out = jnp.concatenate(locs, axis=1).astype(jnp.float32)
    cls_out = jnp.concatenate(clss, axis=1).astype(jnp.float32)
    assert loc_out.shape[1] == NUM_PRIORS, loc_out.shape
    return loc_out, cls_out


# ----------------------------------------------------------------- validation


def detection_agreement(det_a, det_b) -> dict:
    """Compare two Detections batches (e.g. bf16 vs int8 on the same images):
    fraction of matched detections (same label, IoU >= 0.5), mean IoU of
    matches, and max score delta.  Host-side, for tests/reports."""
    import numpy as np

    from .boxes import pairwise_iou

    n_match = n_total = 0
    ious, score_d = [], []
    for b in range(det_a.boxes.shape[0]):
        va = np.asarray(det_a.valid[b])
        vb = np.asarray(det_b.valid[b])
        ba, la, sa = (np.asarray(x[b])[va] for x in (det_a.boxes, det_a.labels, det_a.scores))
        bb, lb, sb = (np.asarray(x[b])[vb] for x in (det_b.boxes, det_b.labels, det_b.scores))
        n_total += max(len(ba), len(bb))
        if len(ba) == 0 or len(bb) == 0:
            continue
        iou = np.asarray(pairwise_iou(jnp.asarray(ba), jnp.asarray(bb)))
        for i in range(len(ba)):
            j = int(np.argmax(iou[i]))
            if iou[i, j] >= 0.5 and la[i] == lb[j]:
                n_match += 1
                ious.append(float(iou[i, j]))
                score_d.append(abs(float(sa[i]) - float(sb[j])))
    return {
        "match_rate": n_match / max(n_total, 1),
        "mean_matched_iou": float(np.mean(ious)) if ious else 0.0,
        "max_score_delta": float(np.max(score_d)) if score_d else 0.0,
    }
