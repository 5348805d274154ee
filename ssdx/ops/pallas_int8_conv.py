"""Pallas int8 convolution backend for the quantized serving path.

Why this exists: the XLA lowering in this toolchain does NOT route int8
GEMMs/convs to the MXU (measured: 2048^3 ``lax.dot(int8,int8)->int32`` =
4,358 ms vs 4.3 ms bf16 — scalar VPU code; see ssdx/quant.py), but the
Mosaic/Pallas compiler DOES: a tiled Pallas int8 matmul measures
264 TFLOP/s vs 191 TFLOP/s for peak XLA bf16 (scripts/bench_int8_mxu.py,
chained + materialized + slope-fit).  This module therefore implements the
int8 backbone convs (ssdx/quant.py ``_TOPOLOGY``, mirroring the reference
conv stack SSD_from_scratch.py:62-155) as Pallas kernels so int8 serving is
an MXU *speed* win, not just a packaging format.

Measured (v5e, bs=32, scripts/bench_int8_conv.py): per-layer 1.1-2.2x the
XLA bf16 conv (peak 420 TF/s on conv5, vs ~190 TF/s bf16 peak).  The
whole post-stem walk is currently ~parity with bf16 (10.4 vs 10.3 ms) —
the per-layer wins are eaten by glue (f32 tap emission + host-side
requantization, sub-1%-FLOP extras layers paying full kernel-launch cost,
bf16 heads); closing that gap is tracked in ROADMAP.md.

Design (one kernel family covers every layer in the topology):

* **Conv as 9 shifted GEMMs on the flat padded image.**  For a 3x3 conv
  with dilation ``d`` on an input padded to width ``Wp``, output pixel
  ``(i, w)`` is ``sum_{ky,kx} x[i+ky*d, w+kx*d] @ W[ky,kx]``.  Flattening
  (row, col) into ONE sublane axis with the *padded* row stride makes each
  (ky, kx) term a contiguous slice at offset ``(ky*d)*Wp + kx*d`` — no
  in-kernel im2col, no gathers.  Columns ``[Wo, Wp)`` of the output are
  wrap-around garbage and are sliced off on the host.
* **One wide dot, not an accumulator chain.**  The nine ``[M, Cin]`` slices
  are lane-concatenated into ``[M, 9*Cin]`` and contracted against the
  k-major-reshaped weights ``[9*Cin, Cout_blk]`` in ONE
  ``int8 x int8 -> int32`` dot, so the MXU's internal K loop accumulates in
  registers instead of re-materializing an int32 accumulator per tap
  (the lesson measured on the stem kernel, ssdx/ops/pallas_stem.py).
* **Fused epilogue.**  ``y = relu(acc_i32 * w_scale[cout] + bias)`` then
  either requantization to the next layer's per-channel int8 grid
  (``emit="int8"``: y / next_scale, round, clip — bitwise the same ops as
  ssdx/quant.apply_int8) or float32 emission for tap layers whose output
  feeds the bf16 multibox heads.
* **Whole image in VMEM.**  Post-stem activations are int8 and small
  (largest: conv3 input 152*152*128 = 2.9 MB), so each grid step sees the
  full flat image and row-blocks are plain dynamic slices — the halo
  problem that needed a second BlockSpec in the bf16 stem kernel vanishes.
* **Strided / VALID layers ride the same kernel**: stride-2 convs
  (ConvBNRelu_16/18) compute the dense stride-1 output and the host slices
  ``[::2, ::2]`` (4x FLOPs on layers that are <1% of the network — cheaper
  than a strided-slice kernel variant); VALID layers just use pad=0.
* **1x1 convs are plain matmuls** ``[B*H*W, Cin] @ [Cin, Cout]`` with the
  same epilogue.

Grid order is (batch, cout-blocks, row-blocks): the flat image block is
constant across both inner axes (fetched once per batch item) and each
weight block is fetched once per (b, j).

Reference parity: layer topology and epilogue order follow
ssdx/quant.apply_int8 exactly; tests/test_pallas_int8_conv.py checks
bitwise agreement in interpret mode per topology case and end-to-end.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["int8_conv", "apply_int8_pallas"]

_I8_MIN, _I8_MAX = -127, 127

# xcat VMEM budget per grid step (bytes); conservative against the ~16 MB
# VMEM with the image, weights, and int32 accumulator co-resident.
_XCAT_BUDGET = 3_000_000


def _epilogue(acc, ws, bias, inv_ns, emit, tap_dtype=jnp.float32):
    """acc [M, Cn] int32 -> int8 (requantized), a float tap, or both.

    ``emit``: "int8" -> requantized int8 for the next layer; "f32"/"tap" ->
    the float activation (tap layers feeding the bf16 heads; "f32" keeps
    the name the oracle tests use); "both" -> (int8, tap) in one pass — tap
    layers WITH a successor emit the requantized successor input and the
    head-dtype tap from one epilogue, so the activation never round-trips
    HBM as f32 for a host-side requantization.

    Requantization multiplies by the precomputed reciprocal scale instead
    of dividing: f32 division is multi-op VPU work per output element
    (measured ~0.3 ms on a conv3-sized [32,150,150,128] output alone).
    The result can differ from the XLA oracle's ``round(y / ns)`` by one
    int8 step on exact rounding boundaries — covered by the test tolerance.
    """
    y = acc.astype(jnp.float32) * ws + bias
    y = jnp.maximum(y, 0.0)
    if emit in ("int8", "both"):
        q = jnp.round(y * inv_ns)
        q = jnp.clip(q, _I8_MIN, _I8_MAX).astype(jnp.int8)
        if emit == "int8":
            return q
        return q, y.astype(tap_dtype)
    return y.astype(tap_dtype)


def _conv3_kernel(x_ref, w_ref, ws_ref, b_ref, ns_ref, *o_refs, bh, Wp, d, emit,
                  tap_dtype=jnp.float32):
    # Mosaic only allows dynamic sublane offsets that are provable multiples
    # of 8: Wp is padded to a multiple of 8 on the host, so ``base`` and the
    # per-ky row offsets are aligned; the +-kx column shifts (1..2d sublanes)
    # are taken as STATIC slices of the loaded window value instead.
    r = pl.program_id(2)
    base = r * (bh * Wp)
    ext = -(-(2 * d) // 8) * 8 + 8
    cin = x_ref.shape[-1]
    wins = [x_ref[0, pl.ds(base + (ky * d) * Wp, bh * Wp + ext), :] for ky in range(3)]
    acc = None
    # Same-kx slices share a sublane offset, so their lane-concat is legal
    # (mixed-offset concat is rejected by Mosaic); three [M, 3*Cin] dots
    # instead of nine [M, Cin] dots keeps most of the register-accumulation
    # win of the single-wide-dot form.
    for kx in range(3):
        cols = [
            jax.lax.slice_in_dim(w, kx * d, kx * d + bh * Wp, axis=0) for w in wins
        ]
        xcat = jnp.concatenate(cols, axis=1)  # [bh*Wp, 3*Cin]
        wk = w_ref[pl.ds(kx * 3 * cin, 3 * cin), :]
        part = jnp.dot(xcat, wk, preferred_element_type=jnp.int32)
        acc = part if acc is None else acc + part
    out = _epilogue(acc, ws_ref[...], b_ref[...], ns_ref[...], emit, tap_dtype)
    if emit == "both":
        o_refs[0][0], o_refs[1][0] = out
    else:
        o_refs[0][0] = out


def _mm_kernel(x_ref, w_ref, ws_ref, b_ref, ns_ref, *o_refs, emit,
               tap_dtype=jnp.float32):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.int32)
    out = _epilogue(acc, ws_ref[...], b_ref[...], ns_ref[...], emit, tap_dtype)
    if emit == "both":
        o_refs[0][...], o_refs[1][...] = out
    else:
        o_refs[0][...] = out


# (H, cin, cout) -> (cnb, bh): sweep winners on the attached v5e
# (scripts/bench_int8_conv.py --sweep, bs=32; see docs/TPU_KERNELS.md).
# Layer shapes are fixed in SSD300, so a measured table beats a model.
_TUNED = {
    (150, 64, 128): (128, 8),  # conv2_1   102.6 TF/s
    (150, 128, 128): (128, 8),  # conv2_2  213.8 TF/s
    (75, 128, 256): (128, 38),  # conv3_1  251.9 TF/s
    (75, 256, 256): (256, 8),  # conv3_2/3 332.5 TF/s
    (38, 512, 512): (512, 8),  # conv4/5   380.9 TF/s
    (19, 512, 512): (128, 7),  # conv5 @19 420.9 TF/s
    (19, 512, 1024): (512, 10),  # conv6 d6 277.3 TF/s
}


def _pick_cnb(H, cin, cout):
    """Cout block width: measured table with a heuristic fallback (wide N
    amortizes the xcat build for deep layers, but narrow N measured faster
    on the shallow-K mid layers)."""
    if (H, cin, cout) in _TUNED:
        return _TUNED[H, cin, cout][0]
    if cin <= 128:
        return min(128, cout)
    return min(256, cout)


def _pick_bh(Ho, Wp, cin, key=None):
    """Row-block height: measured table first, else fit the [bh*Wp, 9*Cin]
    int8 concat under the VMEM budget and equalize blocks so the padded
    grid wastes at most one block-row of compute."""
    if key in _TUNED:
        cap = _TUNED[key][1]
    else:
        cap = max(8, _XCAT_BUDGET // (Wp * 9 * cin))
    if cap >= Ho:
        return Ho
    return math.ceil(Ho / math.ceil(Ho / cap))


def int8_conv(
    xq: jnp.ndarray,
    kernel_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: jnp.ndarray,
    next_in_scale: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    pad: int,
    emit: str = "int8",
    interpret: bool = False,
    cnb: int | None = None,
    bh: int | None = None,
    tap_dtype=jnp.float32,
) -> jnp.ndarray:
    """One quantized conv layer on the MXU.

    xq [B,H,W,Cin] int8, kernel_q [kh,kw,Cin,Cout] int8 (input scales
    pre-folded, ssdx/quant.quantize_ssd), w_scale/bias [Cout] f32.
    ``emit="int8"`` requantizes to ``next_in_scale`` (per-channel [Cout]);
    ``emit="f32"`` returns the float activations in ``tap_dtype`` (tap
    layers); ``emit="both"`` returns the (int8, tap) pair from one pass.
    Returns [B, Ho, Wo, Cout] with Ho/Wo already stride-sliced (a tuple of
    two such arrays for "both").
    """
    kh, kw, cin, cout = kernel_q.shape
    B, H, W, _ = xq.shape
    assert xq.dtype == jnp.int8 and kernel_q.dtype == jnp.int8
    if emit == "int8":
        out_dtypes = [jnp.int8]
    elif emit == "both":
        out_dtypes = [jnp.int8, tap_dtype]
    else:
        out_dtypes = [tap_dtype]
    cnb = cnb or _pick_cnb(H, cin, cout)
    ws2 = jnp.asarray(w_scale, jnp.float32).reshape(1, cout)
    b2 = jnp.asarray(bias, jnp.float32).reshape(1, cout)
    ns = next_in_scale if next_in_scale is not None else jnp.ones((cout,))
    ns2 = 1.0 / jnp.asarray(ns, jnp.float32).reshape(1, cout)
    col = lambda: pl.BlockSpec((1, cnb), lambda *g: (0, g[1]))

    if kh == kw == 1:
        M = B * H * W
        bm = min(2048, -(-M // 8) * 8)
        Mp = -(-M // bm) * bm
        x2 = jnp.pad(xq.reshape(M, cin), ((0, Mp - M), (0, 0)))
        outs = pl.pallas_call(
            functools.partial(_mm_kernel, emit=emit, tap_dtype=tap_dtype),
            grid=(Mp // bm, cout // cnb),
            in_specs=[
                pl.BlockSpec((bm, cin), lambda i, j: (i, 0)),
                pl.BlockSpec((cin, cnb), lambda i, j: (0, j)),
                col(),
                col(),
                col(),
            ],
            out_specs=[pl.BlockSpec((bm, cnb), lambda i, j: (i, j))
                       for _ in out_dtypes],
            out_shape=[jax.ShapeDtypeStruct((Mp, cout), dt)
                       for dt in out_dtypes],
            interpret=interpret,
        )(x2, kernel_q.reshape(cin, cout), ws2, b2, ns2)
        outs = tuple(o[:M].reshape(B, H, W, cout) for o in outs)
        return outs if emit == "both" else outs[0]

    assert (kh, kw) == (3, 3), (kh, kw)
    d = dilation
    p = pad
    # Pad the flat width to a multiple of 8 sublanes so every dynamic
    # window offset in the kernel is provably aligned (see _conv3_kernel).
    Wp = -(-(W + 2 * p) // 8) * 8
    Ho = H + 2 * p - 2 * d  # dense stride-1 output rows
    Wo = W + 2 * p - 2 * d
    bh = bh or _pick_bh(Ho, Wp, cin, key=(H, cin, cout))
    Hob = -(-Ho // bh) * bh
    # Bottom-pad so the last block's deepest window read — base_max +
    # 2d*Wp + bh*Wp + ext sublanes — stays inside the flat image.
    rows_in = Hob + 2 * d + 3
    xpad = jnp.pad(
        xq, ((0, 0), (p, rows_in - H - p), (p, Wp - W - p), (0, 0))
    )
    xf = xpad.reshape(B, rows_in * Wp, cin)
    # kx-major weight layout matches the kernel's per-kx concat of ky slices.
    wf = kernel_q.transpose(1, 0, 2, 3).reshape(9 * cin, cout)
    outs = pl.pallas_call(
        functools.partial(_conv3_kernel, bh=bh, Wp=Wp, d=d, emit=emit,
                          tap_dtype=tap_dtype),
        grid=(B, cout // cnb, Hob // bh),
        in_specs=[
            pl.BlockSpec((1, rows_in * Wp, cin), lambda b, j, r: (b, 0, 0)),
            pl.BlockSpec((9 * cin, cnb), lambda b, j, r: (0, j)),
            col(),
            col(),
            col(),
        ],
        out_specs=[pl.BlockSpec((1, bh * Wp, cnb), lambda b, j, r: (b, r, j))
                   for _ in out_dtypes],
        out_shape=[jax.ShapeDtypeStruct((B, Hob * Wp, cout), dt)
                   for dt in out_dtypes],
        interpret=interpret,
    )(xf, wf, ws2, b2, ns2)

    def _crop(out):
        out = out.reshape(B, Hob, Wp, cout)[:, :Ho, :Wo]
        return out[:, ::stride, ::stride] if stride != 1 else out

    outs = tuple(_crop(o) for o in outs)
    return outs if emit == "both" else outs[0]


# --------------------------------------------------------- full backbone


def _layer_pad(spec) -> int:
    """Symmetric pad width from a quant._L topology entry."""
    if spec.padding == "SAME":
        return spec.dilation if spec.kernel == (3, 3) else 0
    if spec.padding == "VALID":
        return 0
    return spec.padding[0][0]


def apply_int8_pallas(qp, feats: jnp.ndarray, head_dtype=jnp.bfloat16, interpret=False):
    """MXU int8 post-stem forward: same contract and (bitwise) numerics as
    ssdx/quant.apply_int8, with every conv running as a Pallas int8 kernel.

    feats [B,150,150,64] (bf16/f32, from the stem) ->
    (loc [B,8732,4] f32, cls [B,8732,C] f32).  Tap layers with a successor
    emit BOTH the head-dtype tap and the requantized int8 successor input
    from one fused epilogue (emit="both" — the activation never round-trips
    HBM as f32 for a host-side requantization); the final layer emits the
    tap alone; all other layers requantize in-kernel and the inter-layer
    activations stay int8 in HBM.
    """
    from ..priors import BOXES_PER_LOCATION, NUM_PRIORS
    from ..quant import _L, _TOPOLOGY, _conv, _max_pool, _quantize_act

    taps: list[jnp.ndarray | None] = [None] * 6
    first = qp.layers[_TOPOLOGY[0].name]
    xq = _quantize_act(feats.astype(jnp.float32), first.in_scale)
    for i, spec in enumerate(_TOPOLOGY):
        ql = qp.layers[spec.name]
        nxt = _TOPOLOGY[i + 1] if i + 1 < len(_TOPOLOGY) else None
        kw = dict(
            stride=spec.stride,
            dilation=spec.dilation,
            pad=_layer_pad(spec),
            interpret=interpret,
        )
        if spec.tap is not None and nxt is not None:
            xq, tap = int8_conv(
                xq, ql.kernel_q, ql.w_scale, ql.bias,
                qp.layers[nxt.name].in_scale, emit="both",
                tap_dtype=head_dtype, **kw)
            taps[spec.tap] = tap
            if spec.pool:
                xq = _max_pool(xq, ceil=spec.pool == "ceil")
        elif nxt is None:
            taps[spec.tap] = int8_conv(
                xq, ql.kernel_q, ql.w_scale, ql.bias, emit="f32",
                tap_dtype=head_dtype, **kw)
        else:
            xq = int8_conv(
                xq,
                ql.kernel_q,
                ql.w_scale,
                ql.bias,
                qp.layers[nxt.name].in_scale,
                emit="int8",
                **kw,
            )
            if spec.pool:
                xq = _max_pool(xq, ceil=spec.pool == "ceil")

    B = feats.shape[0]
    locs, clss = [], []
    head_spec = _L("head", (3, 3), 1, "SAME", 1, None, None)
    for i, (t, k) in enumerate(zip(taps, BOXES_PER_LOCATION)):
        # Fused loc+cls head: one conv per tap (see ssdx/model.py _HeadParams
        # — halves the MXU 128-lane cout-padding passes; same numerics).
        hl, hc = qp.heads[f"box_head_{i}"], qp.heads[f"cls_head_{i}"]
        kcat = jnp.concatenate([hl["kernel"], hc["kernel"]], axis=-1)
        bcat = jnp.concatenate([hl["bias"], hc["bias"]])
        y = _conv(t, kcat.astype(head_dtype), head_spec, head_dtype)
        y = y + bcat.astype(head_dtype)
        loc, cls = jnp.split(y, [k * 4], axis=-1)
        locs.append(loc.reshape(B, -1, 4))
        clss.append(cls.reshape(B, -1, qp.num_classes))
    loc_out = jnp.concatenate(locs, axis=1).astype(jnp.float32)
    cls_out = jnp.concatenate(clss, axis=1).astype(jnp.float32)
    assert loc_out.shape[1] == NUM_PRIORS, loc_out.shape
    return loc_out, cls_out
