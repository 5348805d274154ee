"""Fused Pallas kernel for the SSD300 stem: conv1_1 + conv1_2 + 2x2 maxpool.

Why: the first VGG block (two 64-channel 3x3 convs at 300x300, the
reference's conv1 layers, SSD_from_scratch.py:46-60) is the measured
inference hotspot — XLA runs the fused block at ~31 TFLOP/s on a v5e
(~16% of peak) because 64 output channels fill only half the MXU's 128
lanes, and the C=3 input conv is layout-bound (~2 TFLOP/s).  An XLA-level
reformulation (width-4/stride-2 conv with duplicated shifted weights) was
measured and did NOT help (scripts/stem_experiments.py), so the packing is
done in a hand-written kernel instead.

Design — "two output pixels per 128-lane register":

  * The input image is pre-arranged (one cheap fused XLA pass,
    :func:`build_stem_patches`) into per-(row, column-pair) patches:
    row-major ``P1[b, r*160 + u, 36]`` = the 3x4x3 input window that
    covers BOTH outputs of column pair ``u = (2u, 2u+1)``; conv1_1 then
    is a single ``[rows*160, 36] @ [36, 128]`` matmul whose 128 output
    lanes are (pixel parity g, channel) — full MXU lanes, no im2col
    in-kernel.
  * conv1_2 consumes that pair-packed activation directly: the 3x3 conv
    over pairs decomposes into 6 shifted 128-lane operands (3 row shifts x
    2 pair shifts) which are lane-concatenated into ONE ``[*, 768]``
    matrix and contracted against ``W2cat [768, 128]`` in a single matmul
    — Mosaic then accumulates over the K tiles in registers, where a
    6-dot ``acc = acc + dot(...)`` chain re-materializes the 2.4 MB f32
    accumulator per dot (~29 MB of VMEM traffic per grid step, the
    dominant cost of the previous revision).  W2cat block ``3p + dr``
    holds weight tap ``2p + g - h`` for input lane group g -> output lane
    group h (zero where out of the 3-tap range); the 1.33x
    structural-zero MACs are the price of full lane occupancy.
  * Everything in the kernel is TWO-dimensional: the (image row, column
    pair) axes stay fused as one sublane axis of extent rows*160, so all
    six stage-2 operands are tile-aligned slices (offsets dr*160, a
    multiple of the 16-sublane bf16 tile) of one scratch buffer — no
    3D->2D collapses, which Mosaic turns into per-matmul relayout copies
    (the v1 3D formulation spent more time relayouting than multiplying).
    The pair dim is padded 151 -> 160 to keep that fusion tile-exact; the
    9 garbage pairs only ever feed discarded outputs.
  * The pair shift (conv taps crossing into the next pair) is one
    sublane-shift-by-1, expressed as a two-slice concat: pltpu.roll
    lowers to tpu.dynamic_rotate which this backend rejects, while the
    concat compiles and was verified correct on hardware.
  * bias + ReLU + the following 2x2 maxpool are fused in-register: the
    horizontal max is a max between the two 64-lane groups, the vertical
    max a max between adjacent 160-row chunks; the kernel writes the
    pooled ``[B, 150, 150, 64]`` feature map straight to HBM — the
    300x300x64 intermediates never leave VMEM.  Pooling runs on the RAW
    stage-2 accumulator (max is monotone and the per-channel bias is
    uniform across the window), so the bias+ReLU epilogue touches 4x
    fewer elements.
  * There are NO mask/select ops in the kernel: the edge-column,
    edge-row, and pad-pair zeroing of the stage-1 activation (which would
    otherwise be ~10 VPU ops over the full activation per grid step) is
    folded into the stage-1 matmul via sentinel K-rows — patch channels
    36/37 are 0/1 "kill" indicators whose weight rows are -1e9 on the
    corresponding lane half (ReLU then clamps to exactly 0), and channel
    38 is a constant 1 carrying the stage-1 bias.  The K dim is padded to
    the 128-lane tile anyway, so the extra rows are free MXU work.
  * Row tiling: R output rows per grid step, with the 2-row conv halo
    fetched as a SECOND BlockSpec view of the same array (a size-2*160
    block at block index (t+1)*R/2), so both DMAs ride Pallas's standard
    automatic pipelining — no manual halo DMA.

Used on the BN-folded serving path only (training keeps the XLA convs and
their autodiff).  Numerics: bf16 inputs/weights, f32 accumulation — same
as the XLA path's ``preferred_element_type`` setting.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_stem_patches", "pack_stem_weights", "stem_conv_pool", "stem_available"]

_R = 30  # output rows per grid step (must divide 300 and be even; 30 measured best of {20,30,50,60})
_CH = 1600  # stage-2 M-chunk: 10 image rows; bounds the a2/acc VMEM footprint
_H = 300
_PAIRS = 151  # logical column pairs: y1 cols -1..300 as (pair, parity)
# Physical pair stride padded to a sublane-tile multiple (bf16 tile = 16):
# keeps every (row, pair) flat slice tile-aligned.  Garbage pairs 151..159
# only ever contribute to discarded output pairs >= 150.
_PP = 160


def stem_available(params: dict) -> bool:
    """True when ``params`` carries the folded stem convs this kernel needs."""
    try:
        for m in ("ConvBNRelu_0", "ConvBNRelu_1"):
            c = params[m]["Conv_0"]
            _ = c["kernel"], c["bias"]
        return True
    except (KeyError, TypeError):
        return False


_K = 40  # patch channels: 36 taps + kill-even + kill-odd + bias-one + pad


def build_stem_patches(x: jnp.ndarray) -> jnp.ndarray:
    """[B,300,300,3] -> [B, 302*160, 40] pair-packed conv1_1 input patches.

    Flat row ``(r+1)*160 + u``, channels:
      * ``[0:36]`` = ``x[b, (r-1)+dr, (2u-2)+dc, ci]`` at channel
        ``(dr*4+dc)*3+ci`` (zero outside the image) — the full 3-row,
        4-column window feeding y1 column pair ``u`` at row ``r``;
      * ``[36]`` = 1 where the pair's EVEN slot (y1 col 2u-1) must be
        zero: pair 0 (y1 col -1), pad pairs u >= 151, and the halo rows
        r = -1 / 300;
      * ``[37]`` = same for the ODD slot (y1 col 2u): pair 150 (col 300),
        pad pairs, halo rows;
      * ``[38]`` = 1 everywhere (carries the stage-1 bias through the
        matmul); ``[39]`` = 0 (tile padding).

    One fused XLA pass, ~7x the input bytes — negligible next to the conv
    FLOPs.
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
    p = jnp.pad(p, ((0, 0), (1, 1), (0, _PP - _PAIRS), (0, 0)))

    pair = jnp.arange(_PP)
    interior = jnp.ones((_H + 2,), p.dtype).at[0].set(0).at[_H + 1].set(0)
    pad_pair = (pair >= _PAIRS).astype(p.dtype)
    kill_e = jnp.maximum((pair == 0).astype(p.dtype), pad_pair)  # [PP]
    kill_o = jnp.maximum((pair == _PAIRS - 1).astype(p.dtype), pad_pair)
    # halo rows kill both slots; interior rows use the per-pair kills
    kill_e = jnp.maximum(kill_e[None, :], 1.0 - interior[:, None])  # [H+2, PP]
    kill_o = jnp.maximum(kill_o[None, :], 1.0 - interior[:, None])
    ones = jnp.ones((_H + 2, _PP), p.dtype)
    zeros = jnp.zeros((_H + 2, _PP), p.dtype)
    extra = jnp.stack([kill_e, kill_o, ones, zeros], axis=-1)  # [H+2, PP, 4]
    extra = jnp.broadcast_to(extra[None], (B, _H + 2, _PP, 4))
    p = jnp.concatenate([p, extra.astype(p.dtype)], axis=-1)  # [..., 40]
    return p.reshape(B, (_H + 2) * _PP, _K)


def pack_stem_weights(w1, b1, w2, b2):
    """Pack HWIO conv weights into the kernel's pair layout.

    Returns (W1 [40,128], W2cat [768,128], B2 [1,64]).
    Lane group g (0: even column, 1: odd column) of a pair sees kernel tap
    ``dc - g`` (conv1_1) / ``2p + g - h`` (conv1_2); taps outside 0..2 are
    structural zeros.  W1 rows 36/37 are -1e9 kill rows (paired with the
    0/1 indicator patch channels; ReLU clamps the result to exactly 0) and
    row 38 carries the stage-1 bias; the stage-2 bias is returned
    separately and applied after pooling (max is monotone, bias uniform).
    """
    w1 = jnp.asarray(w1)
    w2 = jnp.asarray(w2)
    W1 = jnp.zeros((_K, 128), w1.dtype)
    for dr in range(3):
        for dc in range(4):
            for g in range(2):
                k = dc - g
                if 0 <= k <= 2:
                    W1 = W1.at[
                        (dr * 4 + dc) * 3 : (dr * 4 + dc) * 3 + 3,
                        64 * g : 64 * (g + 1),
                    ].set(w1[dr, k])
    # block index matches the kernel's lane-concat order: p-major, then dr
    W2 = jnp.zeros((6, 128, 128), w2.dtype)
    for dr in range(3):
        for p in range(2):
            for g in range(2):
                for h in range(2):
                    k = 2 * p + g - h
                    if 0 <= k <= 2:
                        W2 = W2.at[
                            3 * p + dr, 64 * g : 64 * (g + 1), 64 * h : 64 * (h + 1)
                        ].set(w2[dr, k])
    W2 = W2.reshape(768, 128)
    kill = jnp.asarray(-1e9, w1.dtype)
    W1 = W1.at[36, 0:64].set(kill)  # even slot (y1 col 2u-1)
    W1 = W1.at[37, 64:128].set(kill)  # odd slot (y1 col 2u)
    W1 = W1.at[38, 0:64].set(jnp.asarray(b1, w1.dtype))
    W1 = W1.at[38, 64:128].set(jnp.asarray(b1, w1.dtype))
    B2 = jnp.asarray(b2, jnp.float32).reshape(1, 64)
    return W1, W2, B2


def _stem_kernel(main_ref, tail_ref, w1_ref, w2_ref, b2_ref, out_ref, y1s):
    R = _R
    M = R * _PP  # flat (row, pair) extent of the main block

    w1 = w1_ref[:]

    def stage1(patches):
        """conv1_1 on flat patch rows: one matmul + ReLU.  Bias and ALL
        edge/pad zeroing ride the matmul via the sentinel K-rows (see
        pack_stem_weights) — no selects, no iotas."""
        y = jax.lax.dot_general(
            patches, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y, 0.0).astype(y1s.dtype)

    # y1s flat row i*160+u holds y1 row (t*R - 1 + i), pair u; the main
    # block covers i in [0, R), the 2-row tail block the halo [R, R+2).
    y1s[0:M] = stage1(main_ref[0])
    y1s[M : M + 2 * _PP] = stage1(tail_ref[0])

    y1 = y1s[:]
    # pair j -> j+1 view: one sublane shift.  (Crossing a row boundary at
    # pair 159 drags in the next row's pair 0, but pairs >= 150 of the
    # output are discarded, so the contamination is unreachable.)
    y1_shift = jnp.concatenate([y1[1:], y1[:1]], axis=0)

    # Stage 2 streams over M-chunks: each chunk lane-concats the six
    # shifted operands (p-major, then dr, matching the W2cat block order)
    # into ONE [CH, 768] matrix and contracts it in a single matmul — the
    # MXU's internal K loop accumulates in registers (an
    # ``acc = acc + dot(...)`` chain re-materializes the f32 accumulator
    # in VMEM per dot, which dominated an earlier revision), while the
    # chunking keeps the concat buffer at ~2.5 MB so a large R (fewer,
    # better-amortized grid steps) still fits VMEM.  Chunk boundaries are
    # multiples of 10 image rows, so pooling never crosses a chunk.
    b2 = b2_ref[0]
    rows_per_chunk = _CH // _PP
    out_rows = rows_per_chunk // 2
    for ci in range(M // _CH):
        base = ci * _CH
        a2 = jnp.concatenate(
            [y1[dr * _PP + base : dr * _PP + base + _CH] for dr in range(3)]
            + [y1_shift[dr * _PP + base : dr * _PP + base + _CH] for dr in range(3)],
            axis=1,
        )  # [CH, 768]
        acc = jax.lax.dot_general(
            a2, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # pool FIRST (monotone max, uniform per-channel bias), then
        # bias+ReLU on the 4x-smaller pooled map
        pooled_h = jnp.maximum(acc[:, :64], acc[:, 64:])  # [CH, 64]
        for k in range(out_rows):
            a = pooled_h[(2 * k) * _PP : (2 * k) * _PP + _PP]
            b = pooled_h[(2 * k + 1) * _PP : (2 * k + 1) * _PP + _PP]
            v = jnp.maximum(jnp.maximum(a, b) + b2[None, :], 0.0)
            out_ref[0, ci * out_rows + k] = v[: _PAIRS - 1].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _stem_call(patches, W1, W2, B2, interpret: bool, out_dtype):
    B = patches.shape[0]
    T = _H // _R
    grid = (B, T)
    flops = B * _H * _PP * 128 * 2 * (36 + 6 * 128)
    return pl.pallas_call(
        _stem_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, _R * _PP, _K), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * _PP, _K),
                lambda b, t: (b, (t + 1) * (_R // 2), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_K, 128), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((768, 128), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _R // 2, _PAIRS - 1, 64), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, _H // 2, _H // 2, 64), out_dtype),
        scratch_shapes=[pltpu.VMEM(((_R + 2) * _PP, 128), out_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=patches.size * 2, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(patches, patches, W1, W2, B2)  # same array via main + halo views


def stem_conv_pool(
    images: jnp.ndarray,
    params: dict,
    *,
    interpret: bool | None = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Run the fused stem on [B,300,300,3] images -> [B,150,150,64].

    ``params`` is the BN-folded SSD300 param tree (the kernel reads
    ``ConvBNRelu_{0,1}/Conv_0``).  ``interpret`` defaults to True off-TPU
    (tests/CPU) and False on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    c0 = params["ConvBNRelu_0"]["Conv_0"]
    c1 = params["ConvBNRelu_1"]["Conv_0"]
    W1, W2, B2 = pack_stem_weights(
        jnp.asarray(c0["kernel"], compute_dtype),
        jnp.asarray(c0["bias"], jnp.float32),
        jnp.asarray(c1["kernel"], compute_dtype),
        jnp.asarray(c1["bias"], jnp.float32),
    )
    patches = build_stem_patches(images.astype(compute_dtype))
    return _stem_call(patches, W1, W2, B2, interpret, compute_dtype)
