import jax
import jax.numpy as jnp
import numpy as np

from ssdx.mesh import (
    batch_sharding,
    create_mesh,
    initialize_distributed,
    replicated,
    shard_batch,
)


def test_create_mesh_all_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_create_mesh_subset():
    mesh = create_mesh(jax.devices()[:4])
    assert mesh.devices.size == 4


def test_shard_batch_places_leading_axis():
    mesh = create_mesh()
    x = {"a": jnp.zeros((16, 3)), "b": jnp.zeros((16,))}
    sharded = shard_batch(x, mesh)
    for leaf in jax.tree.leaves(sharded):
        assert len(leaf.devices()) == 8
    np.testing.assert_allclose(np.asarray(sharded["a"]), np.zeros((16, 3)))


def test_replicated_spec():
    mesh = create_mesh()
    r = replicated(mesh)
    b = batch_sharding(mesh)
    assert r.spec != b.spec


def test_initialize_distributed_single_process_noop():
    initialize_distributed()  # must not raise for single-process runs
