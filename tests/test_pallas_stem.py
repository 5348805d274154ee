"""Fused Pallas stem kernel vs the XLA conv oracle (interpret mode on CPU).

The kernel computes conv1_1 + conv1_2 + 2x2 maxpool of the BN-folded
SSD300 stem (reference conv1 block, SSD_from_scratch.py:46-60 + mp1).
The oracle is the same math via jax.lax.conv_general_dilated in f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdx.ops.pallas_stem import (
    build_stem_patches,
    pack_stem_weights,
    stem_available,
    stem_conv_pool,
)


def _oracle(x, w1, b1, w2, b2):
    def conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y + b, 0.0)

    y = conv(conv(x, w1, b1), w2, b2)
    B, H, W, C = y.shape
    y = y.reshape(B, H // 2, 2, W // 2, 2, C)
    return y.max(axis=(2, 4))


@pytest.fixture(scope="module")
def stem_data():
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (2, 300, 300, 3)).astype(np.float32)
    w1 = rng.normal(0, 0.15, (3, 3, 3, 64)).astype(np.float32)
    b1 = rng.normal(0, 0.3, (64,)).astype(np.float32)
    w2 = rng.normal(0, 0.08, (3, 3, 64, 64)).astype(np.float32)
    b2 = rng.normal(0, 0.3, (64,)).astype(np.float32)
    return x, w1, b1, w2, b2


def test_patches_layout(stem_data):
    x, *_ = stem_data
    p = np.asarray(build_stem_patches(jnp.asarray(x)))
    assert p.shape == (2, 302 * 160, 40)  # flat (row, pair), pair stride 160
    p = p.reshape(2, 302, 160, 40)
    assert np.all(p[:, :, 151:, :36] == 0)  # padded pairs carry no taps
    # sentinel channels: kill indicators + constant bias carrier
    assert np.all(p[:, :, 151:, 36] == 1) and np.all(p[:, :, 151:, 37] == 1)
    assert np.all(p[:, 0, :, 36] == 1) and np.all(p[:, -1, :, 37] == 1)  # halo rows
    assert np.all(p[:, 1:-1, 0, 36] == 1)   # pair 0 even slot (y1 col -1)
    assert np.all(p[:, 1:-1, 150, 37] == 1)  # pair 150 odd slot (y1 col 300)
    assert np.all(p[:, 1:-1, 1:150, 36] == 0) and np.all(p[:, 1:-1, 1:150, 37] == 0)
    assert np.all(p[..., 38] == 1) and np.all(p[..., 39] == 0)
    # P1[b, r+1, u, (dr*4+dc)*3+ci] == x[b, r-1+dr, 2u-2+dc, ci]
    b, r, u = 1, 137, 60
    for dr in range(3):
        for dc in range(4):
            for ci in range(3):
                want = x[b, r - 1 + dr, 2 * u - 2 + dc, ci]
                got = p[b, r + 1, u, (dr * 4 + dc) * 3 + ci]
                np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # zero padding outside the image
    # halo rows carry no taps (their sentinel kill channels are 1)
    assert np.all(p[:, 0, :, :36] == 0) and np.all(p[:, -1, :, :36] == 0)
    assert np.all(p[:, 1, 0, 0:3] == 0)  # u=0, dc=0 -> x col -2


def test_stem_kernel_matches_oracle_f32(stem_data):
    x, w1, b1, w2, b2 = stem_data
    params = {
        "ConvBNRelu_0": {"Conv_0": {"kernel": w1, "bias": b1}},
        "ConvBNRelu_1": {"Conv_0": {"kernel": w2, "bias": b2}},
    }
    assert stem_available(params)
    ref = np.asarray(_oracle(jnp.asarray(x), w1, b1, w2, b2))
    got = np.asarray(
        stem_conv_pool(jnp.asarray(x), params, interpret=True, compute_dtype=jnp.float32)
    )
    assert got.shape == (2, 150, 150, 64)
    # The kernel sums the 3x3 taps in a different order (12-tap pair window
    # with structural zeros), so a conv1_1 pre-activation sitting exactly on
    # the ReLU knife edge can flip under f32 rounding and propagate ~1e-3;
    # everything away from the knife edge agrees to float precision.
    err = np.abs(got - ref)
    assert float(np.quantile(err, 0.9999)) < 1e-4, float(np.quantile(err, 0.9999))
    assert float(err.max()) < 5e-3, float(err.max())


def test_stem_kernel_bf16_close(stem_data):
    x, w1, b1, w2, b2 = stem_data
    params = {
        "ConvBNRelu_0": {"Conv_0": {"kernel": w1, "bias": b1}},
        "ConvBNRelu_1": {"Conv_0": {"kernel": w2, "bias": b2}},
    }
    ref = np.asarray(_oracle(jnp.asarray(x), w1, b1, w2, b2))
    got = np.asarray(
        stem_conv_pool(jnp.asarray(x), params, interpret=True)
    ).astype(np.float32)
    # bf16 activations/weights, f32 accumulation: relative error ~1e-2
    err = np.abs(got - ref) / (np.abs(ref) + 1.0)
    assert float(err.max()) < 0.05, float(err.max())


def test_pack_weights_shapes(stem_data):
    _, w1, b1, w2, b2 = stem_data
    W1, W2, B2 = pack_stem_weights(w1, b1, w2, b2)
    assert W1.shape == (40, 128) and W2.shape == (768, 128)
    assert B2.shape == (1, 64)
    # structural zeros: conv1_2 block (p=0, dr=0), g=0 -> h=1 is tap -1
    assert np.all(np.asarray(W2)[:64, 64:] == 0)
    # sentinel rows: kill weights and the bias carrier
    W1 = np.asarray(W1)
    assert np.all(W1[36, :64] == -1e9) and np.all(W1[36, 64:] == 0)
    assert np.all(W1[37, 64:] == -1e9) and np.all(W1[37, :64] == 0)
    np.testing.assert_allclose(W1[38, :64], b1, rtol=1e-6)


def test_detector_stem_kernel_end_to_end():
    """Detector(stem_kernel=True) matches the standard folded path through
    the FULL model forward (stem kernel -> stem_input model apply)."""
    from ssdx.api import Detector

    cls_map = {"car": 0, "truck": 1}
    base = Detector(cls_map, dtype=jnp.float32, rng_seed=3, fold_bn=True)
    fast = Detector(
        cls_map, dtype=jnp.float32, rng_seed=3, fold_bn=True, stem_kernel=True
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (2, 300, 300, 3)), jnp.float32)
    loc_a, cls_a = base.forward(x)
    loc_b, cls_b = fast.forward(x)
    np.testing.assert_allclose(np.asarray(loc_a), np.asarray(loc_b), atol=2e-3)
    np.testing.assert_allclose(np.asarray(cls_a), np.asarray(cls_b), atol=2e-3)
