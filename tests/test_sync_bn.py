"""Sync-BN under data parallelism: ssdx/mesh.py claims that with the batch
sharded and parameters replicated, BatchNorm batch statistics are GLOBAL
means over the full logical batch (XLA lowers the mean to cross-replica
collectives) — i.e. a bs=16 batch sharded 8 ways trains identically to the
reference's single-device bs=16 (SSD_trainer.py single-device BN).

This test proves the claim: one train-mode forward on the same global batch,
1-device vs 8-virtual-device sharded, must produce the same updated
batch_stats within float tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdx.mesh import batch_sharding, create_mesh, replicated
from ssdx.model import SSD300


@pytest.fixture(scope="module")
def setup():
    model = SSD300(num_classes=6, width_mult=0.25)  # BN-sync is width-independent
    variables = model.init_variables(jax.random.key(0), batch_size=1)
    imgs = np.random.default_rng(0).normal(0, 1, (8, 300, 300, 3)).astype(
        np.float32
    )
    return model, variables, imgs


def _stats(model, variables, images, mesh=None):
    def fwd(variables, images):
        (loc, cls), mutated = model.apply(
            variables, images, train=True, mutable=["batch_stats"]
        )
        return mutated["batch_stats"]

    if mesh is None:
        return jax.jit(fwd)(variables, jnp.asarray(images))
    variables = jax.device_put(variables, replicated(mesh))
    images = jax.device_put(jnp.asarray(images), batch_sharding(mesh))
    return jax.jit(fwd, out_shardings=replicated(mesh))(variables, images)


def test_sharded_batch_stats_equal_single_device(setup):
    model, variables, imgs = setup
    bs_single = _stats(model, variables, imgs)
    bs_sharded = _stats(model, variables, imgs, mesh=create_mesh())

    flat_s, _ = jax.tree.flatten(bs_single)
    flat_m, _ = jax.tree.flatten(bs_sharded)
    assert len(flat_s) == len(flat_m)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )
