"""bn_relu_pool: every backend must match the unfused flax composition.

The op fuses train-mode BatchNorm + ReLU + 2x2/2 maxpool
(reference stem tail: torch BatchNorm2d + ReLU + MaxPool2d,
SSD_from_scratch.py:52-60) with a custom VJP.  The reference for
correctness is the plain flax composition differentiated by XLA autodiff;
on continuous random data (no pooling ties) every backend's gradients
must agree with it to float tolerance.  mean/var outputs must equal the
batch statistics flax's BatchNorm folds into its running-average update.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ssdx.ops.fused_bn_pool import bn_relu_pool

BACKENDS = ["xla", "xla_mask", "pallas_interpret"]


def _ref_loss(mod, vs, C):
    def f(args):
        x, g, b = args
        y, mut = mod.apply(
            {"params": {"scale": g, "bias": b},
             "batch_stats": vs["batch_stats"]},
            x, mutable=["batch_stats"])
        p = nn.max_pool(nn.relu(y), (2, 2), strides=(2, 2))
        bs = mut["batch_stats"]
        # un-mix the running update (ra*0.9 + batch*0.1) back to batch stats
        mean = (bs["mean"] - 0.9 * vs["batch_stats"]["mean"]) / 0.1
        var = (bs["var"] - 0.9 * vs["batch_stats"]["var"]) / 0.1
        return (jnp.sum(p ** 2) + jnp.sum(mean * jnp.arange(C, dtype=mean.dtype))
                + jnp.sum(var * 0.5))
    return f


def _fused_loss(backend, C):
    def f(args):
        x, g, b = args
        p, mean, var = bn_relu_pool(x, g, b, 1e-5, False, True, backend)
        return (jnp.sum(p ** 2) + jnp.sum(mean * jnp.arange(C, dtype=mean.dtype))
                + jnp.sum(var * 0.5))
    return f


@pytest.mark.parametrize("backend", BACKENDS)
def test_matches_flax_composition(backend):
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 12, 16, 64
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(1, 0.2, C).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.2, C).astype(np.float32))

    mod = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32,
                       param_dtype=jnp.float32)
    vs = mod.init(jax.random.key(0), x)

    v0, g0 = jax.value_and_grad(_ref_loss(mod, vs, C))((x, gamma, beta))
    v1, g1 = jax.value_and_grad(_fused_loss(backend, C))((x, gamma, beta))

    assert abs(float(v0 - v1)) < 1e-2 * max(1.0, abs(float(v0)))
    for a, b, name in zip(g0, g1, ("dx", "dgamma", "dbeta")):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-5 * scale, (backend, name, err, scale)


@pytest.mark.parametrize("backend", ["xla"])
def test_general_path_ceil_odd(backend):
    """Odd extents + ceil mode fall back to the general window path."""
    rng = np.random.default_rng(1)
    B, H, W, C = 2, 7, 9, 8
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    gamma = jnp.ones(C)
    beta = jnp.zeros(C)

    p, mean, var = bn_relu_pool(x, gamma, beta, 1e-5, True, True, backend)
    assert p.shape == (B, 4, 5, C)

    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(0, 1, 2))
    v = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(m)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v), atol=1e-5)

    # gradient flows and has the right shape
    g = jax.grad(lambda xi: jnp.sum(
        bn_relu_pool(xi, gamma, beta, 1e-5, True, True, backend)[0] ** 2))(x)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))


def test_primal_matches_fwd_pallas_interpret():
    """custom_vjp primal and fwd rules must produce the same pooled map."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 64)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(1, 0.1, 64).astype(np.float32))
    beta = jnp.zeros(64)
    p0, m0, v0 = bn_relu_pool(x, gamma, beta, 1e-5, False, True,
                              "pallas_interpret")
    (p1, m1, v1), _ = jax.vjp(
        lambda a, g, b: bn_relu_pool(a, g, b, 1e-5, False, True,
                                     "pallas_interpret"), x, gamma, beta)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)


def test_tie_split_even_routing():
    """All-equal window: pallas backend splits the cotangent evenly."""
    x = jnp.ones((1, 2, 16, 64), jnp.float32)
    gamma = jnp.ones(64)
    beta = jnp.ones(64)  # keeps post-BN value positive (BN output = beta)
    g = jax.grad(lambda xi: jnp.sum(
        bn_relu_pool(xi, gamma, beta, 1e-5, False, True,
                     "pallas_interpret")[0]))(x)
    # every window position carries dp/4 * d(bn)/dx; just check uniformity
    vals = np.unique(np.round(np.asarray(g), 6))
    assert vals.size == 1, vals
