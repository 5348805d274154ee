"""max_pool_2x2: packed forward + Pallas backward vs flax nn.max_pool.

Forward must match exactly; backward must match on continuous data (no
ties).  On ties the op splits the window cotangent evenly (jnp.max
convention) while reduce_window routes to one position — tested
separately.  Reference pool: torch MaxPool2d (SSD_from_scratch.py:56-60).
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ssdx.ops.pallas_pool import max_pool_2x2


def _ref(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def test_forward_matches_flax():
    rng = np.random.default_rng(0)
    for shape in [(2, 12, 16, 64), (1, 8, 16, 128), (2, 10, 300, 64),
                  (1, 7, 9, 8)]:  # last one exercises the fallback
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(_ref(x)),
                                      np.asarray(max_pool_2x2(x, True)))


def test_backward_matches_flax_no_ties():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 12, 32, 64)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 6, 16, 64)).astype(np.float32))
    _, vr = jax.vjp(_ref, x)
    _, vp = jax.vjp(lambda t: max_pool_2x2(t, True), x)
    np.testing.assert_allclose(np.asarray(vr(g)[0]), np.asarray(vp(g)[0]),
                               atol=0)


def test_tie_split_even():
    x = jnp.ones((1, 2, 16, 64), jnp.float32)
    g = jnp.full((1, 1, 8, 64), 4.0)
    _, vp = jax.vjp(lambda t: max_pool_2x2(t, True), x)
    np.testing.assert_array_equal(np.unique(np.asarray(vp(g)[0])), [1.0])
