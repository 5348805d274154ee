import numpy as np
import jax
import jax.numpy as jnp

from ssdx.train.checkpoint import (
    load_checkpoint,
    load_params,
    save_checkpoint,
    save_params,
)
from ssdx.train.schedule import build_optimizer
from ssdx.train.step import TrainState


def _tiny_state():
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    tx, _ = build_optimizer(steps_per_epoch=4)
    return TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats={"bn": {"mean": jnp.zeros(3), "var": jnp.ones(3)}},
        opt_state=tx.init(params),
    ), tx


def test_roundtrip(tmp_path):
    state, tx = _tiny_state()
    loss_dict = {"train_loss": [1.0, 0.5], "epochs": [2]}
    key = jax.random.key(42)
    p = save_checkpoint(3, state, loss_dict, rng_key=key, best_metric=0.5,
                        outdir=tmp_path, tag="last")
    assert p.name == "last.ckpt"

    fresh, _ = _tiny_state()
    fresh = fresh.replace(params=jax.tree.map(jnp.zeros_like, fresh.params))
    restored, start_epoch, best, ld, rkey = load_checkpoint(p, fresh)
    assert start_epoch == 4
    assert best == 0.5
    assert ld["train_loss"] == [1.0, 0.5]
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(restored.step) == 7
    # restored key reproduces the same stream
    a = jax.random.normal(key, (4,))
    b = jax.random.normal(rkey, (4,))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_atomic_overwrite(tmp_path):
    state, _ = _tiny_state()
    save_checkpoint(1, state, None, outdir=tmp_path, tag="best")
    save_checkpoint(2, state, None, outdir=tmp_path, tag="best")
    _, start, *_ = load_checkpoint(tmp_path / "best.ckpt", state)
    assert start == 3
    assert not (tmp_path / "best.ckpt.tmp").exists()


def test_params_only_export(tmp_path):
    state, _ = _tiny_state()
    path = save_params(state.params, state.batch_stats, tmp_path / "weights.npz")
    blob = load_params(path)
    np.testing.assert_allclose(blob["params"]["w"], np.arange(6.0).reshape(2, 3))
    assert "batch_stats" in blob


def test_npz_bundle_roundtrip(tmp_path):
    """save_params_npz writes a compressed f16 zip bundle; load_params
    detects the container by magic bytes (not suffix) and rebuilds the
    nested {'params','batch_stats'} tree in float32."""
    from ssdx.train.checkpoint import save_params_npz

    state, _ = _tiny_state()
    path = save_params_npz(state.params, state.batch_stats, tmp_path / "demo.npz")
    blob = load_params(path)
    np.testing.assert_allclose(
        blob["params"]["w"], np.arange(6.0).reshape(2, 3), atol=1e-2
    )
    assert blob["params"]["w"].dtype == np.float32
    assert "batch_stats" in blob
    # pickle exports keep loading regardless of their file name
    p2 = save_params(state.params, state.batch_stats, tmp_path / "also.npz")
    assert "params" in load_params(p2)
