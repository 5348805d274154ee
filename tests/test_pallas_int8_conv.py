"""Pallas int8 conv backend (ssdx/ops/pallas_int8_conv.py) vs the XLA
int8 oracle (ssdx/quant.py), in interpret mode on CPU.

The conv arithmetic is exact integer math (int8 x int8 -> int32).  The
f32 epilogue applies the same ops in the same order as quant.apply_int8,
but XLA's freedom to fuse mul+add into FMA differently on the two paths
leaves 1-ulp f32 differences, which the requantization round can amplify
into a +/-1 int8 step on values that land exactly on a rounding boundary.
Comparisons are therefore ulp-aware: f32 within float32 roundoff, int8
within 1 LSB on a <1% sliver of elements.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssdx import quant
from ssdx.ops.pallas_int8_conv import apply_int8_pallas, int8_conv

RNG = np.random.default_rng(7)


def _rand_layer(cin, cout, kh=3, kw=3):
    kq = jnp.asarray(RNG.integers(-127, 128, (kh, kw, cin, cout)).astype(np.int8))
    ws = jnp.asarray(RNG.uniform(1e-3, 2e-3, cout).astype(np.float32))
    b = jnp.asarray(RNG.normal(0, 0.1, cout).astype(np.float32))
    ns = jnp.asarray(RNG.uniform(0.01, 0.05, cout).astype(np.float32))
    return kq, ws, b, ns


def _oracle(xq, kq, ws, b, ns, spec, emit):
    y32 = quant._conv(xq, kq, spec, jnp.int32)
    y = y32.astype(jnp.float32) * ws + b
    y = jax.nn.relu(y)
    if emit == "int8":
        return quant._quantize_act(y, ns)
    return y


CASES = [
    # (name, H, cin, cout, stride, padding, dilation, pad_int)
    ("same_3x3", 14, 16, 32, 1, "SAME", 1, 1),
    ("dilated", 13, 24, 16, 1, ((2, 2), (2, 2)), 2, 2),
    ("stride2", 11, 16, 24, 2, ((1, 1), (1, 1)), 1, 1),
    ("valid", 9, 16, 16, 1, "VALID", 1, 0),
    ("one_by_one", 7, 32, 16, 1, "VALID", 1, 0),
]


@pytest.mark.parametrize("name,H,cin,cout,stride,padding,dilation,pad", CASES)
def test_layer_exact_vs_oracle(name, H, cin, cout, stride, padding, dilation, pad):
    k = 1 if name == "one_by_one" else 3
    kq, ws, b, ns = _rand_layer(cin, cout, k, k)
    xq = jnp.asarray(RNG.integers(-127, 128, (2, H, H, cin)).astype(np.int8))
    spec = quant._L(name, (k, k), stride, padding, dilation, None, None)
    def _check(got, emit):
        want = _oracle(xq, kq, ws, b, ns, spec, emit)
        assert got.shape == want.shape, (name, emit, got.shape, want.shape)
        g, w = np.asarray(got), np.asarray(want)
        if emit == "f32":
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-4)
        else:
            diff = np.abs(g.astype(np.int32) - w.astype(np.int32))
            assert diff.max() <= 1, (name, diff.max())
            assert (diff != 0).mean() < 0.01, (name, (diff != 0).mean())

    for emit in ("int8", "f32"):
        got = int8_conv(
            xq, kq, ws, b, ns if emit == "int8" else None,
            stride=stride, dilation=dilation, pad=pad, emit=emit, interpret=True,
        )
        _check(got, emit)

    # fused dual emission (tap layers): both outputs from one pass
    got_q, got_tap = int8_conv(
        xq, kq, ws, b, ns, stride=stride, dilation=dilation, pad=pad,
        emit="both", interpret=True,
    )
    _check(got_q, "int8")
    _check(got_tap, "f32")


def test_full_backbone_vs_apply_int8():
    """apply_int8_pallas tracks apply_int8 through all 21 layers + heads on
    the bundled trained demo weights (1-ulp epilogue diffs can flip an
    occasional requantization step, so head outputs get a small absolute
    tolerance in the dequantized domain)."""
    from pathlib import Path

    import ssdx.serve.app as app_mod
    from ssdx.api import Detector
    from ssdx.serve.app import CLASS_TO_IDX

    bundled = Path(app_mod.__file__).parent / "demo_weights.npz"
    det = Detector.from_weights(bundled, CLASS_TO_IDX, fold_bn=True)
    params = det.variables["params"]
    feats = quant.stem_bf16(params, jnp.asarray(RNG.normal(0, 1, (1, 300, 300, 3)), jnp.float32))
    scales = quant.calibrate_act_scales(params, feats)
    qp = quant.quantize_ssd(params, scales, det.num_classes)

    # The reference side runs apply_int8's f32 fast route: it is pinned to
    # the exact int32 contraction by tests/test_quant.py::
    # test_f32_compute_route_matches_int32 (at the worst-accumulation layer
    # shape), and the scalar int32 CPU walk costs ~150 s for one image.
    # Any residual one-int32-step difference is far inside the 0.25
    # dequantized-domain tolerance below.
    loc_w, cls_w = jax.jit(
        lambda f: quant.apply_int8(qp, f, compute="f32")
    )(feats)
    loc_g, cls_g = jax.jit(lambda f: apply_int8_pallas(qp, f, interpret=True))(feats)
    for g, w in ((loc_g, loc_w), (cls_g, cls_w)):
        diff = np.abs(np.asarray(g) - np.asarray(w))
        assert diff.max() <= 0.25, diff.max()
        assert (diff > 0.05).mean() < 0.01, (diff > 0.05).mean()
