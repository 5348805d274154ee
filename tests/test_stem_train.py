"""Train-mode Pallas stem vs the XLA composition (interpret mode).

The op fuses conv1_1+BN+ReLU+conv1_2+BN+ReLU+pool with a hand-written
six-kernel VJP (reference: torch stem SSD_from_scratch.py:46-60 under the
SSD_trainer.py train loop).  In float32 the forward, batch statistics, and
every nonzero parameter gradient must match XLA autodiff of the plain
composition to ~1e-5 relative; db1/db2 are analytically zero under
train-mode BN (which subtracts the batch mean) and the op returns exact
zeros where autodiff returns accumulated rounding noise.

Measured on TPU (interleaved A/B, bs=16 bf16 fwd+bwd through
value_and_grad): 5.93 ms/iter vs 13.46 XLA — 2.3x.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ssdx.ops.pallas_stem_train import stem_train, stem_train_reference_params


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    B = 1
    x = jnp.asarray(rng.normal(0, 1, (B, 300, 300, 3)).astype(np.float32))
    args = (
        jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, 64).astype(np.float32)),
        jnp.asarray(rng.normal(1, 0.1, 64).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, 64).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, 64).astype(np.float32)),
        jnp.asarray(rng.normal(1, 0.1, 64).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, 64).astype(np.float32)),
    )
    return x, args


def _ref(x, args):
    w1, b1, g1, be1, w2, b2, g2, be2 = args
    B = x.shape[0]

    def bn(y, g, b, eps=1e-5):
        m = jnp.mean(y, axis=(0, 1, 2))
        v = jnp.mean(jnp.square(y), axis=(0, 1, 2)) - m ** 2
        return (y - m) * jax.lax.rsqrt(v + eps) * g + b, m, v

    dn1 = jax.lax.conv_dimension_numbers(
        (B, 300, 300, 3), (3, 3, 3, 64), ("NHWC", "HWIO", "NHWC"))
    y1 = jax.lax.conv_general_dilated(
        x, w1, (1, 1), "SAME", dimension_numbers=dn1) + b1
    t1, m1, v1 = bn(y1, g1, be1)
    dn2 = jax.lax.conv_dimension_numbers(
        (B, 300, 300, 64), (3, 3, 64, 64), ("NHWC", "HWIO", "NHWC"))
    y2 = jax.lax.conv_general_dilated(
        jnp.maximum(t1, 0), w2, (1, 1), "SAME",
        dimension_numbers=dn2) + b2
    t2, m2, v2 = bn(y2, g2, be2)
    p = nn.max_pool(jnp.maximum(t2, 0), (2, 2), strides=(2, 2))
    return p, m1, v1, m2, v2


def test_forward_and_grads_match_xla_f32(setup):
    x, args = setup
    ref_out = _ref(x, args)
    got_out = stem_train(x, *args, 1e-5, True, jnp.float32)
    for name, a, b in zip(("p", "m1", "v1", "m2", "v2"), ref_out, got_out):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 5e-5, (name, rel)

    g_ref = jax.grad(lambda a: jnp.sum(_ref(x, a)[0] ** 2))(args)
    g_got = jax.grad(lambda a: jnp.sum(
        stem_train(x, *a, 1e-5, True, jnp.float32)[0] ** 2))(args)
    names = ["dw1", "db1", "dg1", "dbe1", "dw2", "db2", "dg2", "dbe2"]
    for n, a, b in zip(names, g_ref, g_got):
        a, b = np.asarray(a), np.asarray(b)
        if n in ("db1", "db2"):
            # analytically zero under train-mode BN; the op returns exact 0,
            # autodiff returns reduction noise ~1e5x smaller than dw scales
            assert np.abs(b).max() == 0.0
            assert np.abs(a).max() < 1.0, (n, np.abs(a).max())
            continue
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 1e-4, (n, rel)


def test_image_gradient_is_zero(setup):
    """dx is declared out of scope (images are data) — must be exact zeros."""
    x, args = setup
    dx = jax.grad(lambda xi: jnp.sum(
        stem_train(xi, *args, 1e-5, True, jnp.float32)[0]))(x)
    assert float(jnp.max(jnp.abs(dx))) == 0.0


def test_reference_params_extractor(setup):
    from ssdx.model import SSD300
    model = SSD300(num_classes=6, dtype=jnp.float32, width_mult=0.125)
    vs = model.init(jax.random.key(0), jnp.zeros((1, 300, 300, 3)))
    got = stem_train_reference_params(vs["params"])
    assert got[0].shape[:3] == (3, 3, 3)
    assert all(g is not None for g in got)
