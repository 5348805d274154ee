import jax
import jax.numpy as jnp
import numpy as np

from ssdx.model import SSD300, IMAGE_SIZE


def test_forward_shapes_and_param_count():
    model = SSD300(num_classes=6)
    variables = model.init_variables(jax.random.key(0), batch_size=2)
    x = jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3))
    loc, cls = model.apply(variables, x, train=False)
    assert loc.shape == (2, 8732, 4)
    assert cls.shape == (2, 8732, 6)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # Reference mySSD with 6 classes is a ~26M-param CNN (SURVEY §2.2).
    assert 24e6 < n_params < 29e6, n_params


def test_train_mode_updates_batch_stats():
    model = SSD300(num_classes=6)
    variables = model.init_variables(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, IMAGE_SIZE, IMAGE_SIZE, 3))
    (loc, cls), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_bfloat16_compute_outputs_float32():
    model = SSD300(num_classes=6, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.key(0))
    x = jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3))
    loc, cls = model.apply(variables, x, train=False)
    assert loc.dtype == jnp.float32 and cls.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(loc)))
