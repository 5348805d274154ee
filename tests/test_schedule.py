import math

import numpy as np
import pytest

from ssdx.train.schedule import build_optimizer, warmup_cosine_schedule


def _oracle_factor(t, warmup, total, min_ratio):
    """Reference lr_lambda transcription (SSD_trainer.py:1075-1111)."""
    if t < warmup and warmup > 0:
        return t / max(1, warmup)
    progress = min(max((t - warmup) / max(1, total - warmup), 0.0), 1.0)
    cos = 0.5 * (1 + math.cos(math.pi * progress))
    return min_ratio + (1 - min_ratio) * cos


def test_matches_reference_factors():
    base, mn, warmup, total = 3e-3, 1e-6, 50, 1000
    sched = warmup_cosine_schedule(base, warmup, total, mn)
    for t in [0, 1, 25, 49, 50, 51, 400, 999, 1000, 1500]:
        exp = base * _oracle_factor(t, warmup, total, mn / base)
        assert np.isclose(float(sched(t)), exp, rtol=1e-5), t


def test_zero_warmup():
    sched = warmup_cosine_schedule(1e-2, 0, 100, 0.0)
    assert np.isclose(float(sched(0)), 1e-2)
    assert float(sched(100)) < 1e-6


def test_validation():
    with pytest.raises(ValueError):
        warmup_cosine_schedule(1e-3, -1, 100)
    with pytest.raises(ValueError):
        warmup_cosine_schedule(1e-3, 10, 0)
    with pytest.raises(ValueError):
        warmup_cosine_schedule(1e-3, 200, 100)
    with pytest.raises(ValueError):
        warmup_cosine_schedule(1e-3, 10, 100, min_lr=1.0)


def test_build_optimizer_step_shapes():
    import jax.numpy as jnp
    import optax

    tx, sched = build_optimizer(steps_per_epoch=10, max_epochs=2, warmup_epochs=1)
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((3, 3)), "b": jnp.ones(3)}
    updates, opt_state = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    assert new["w"].shape == (3, 3)
    # first step lr is 0 (linear warmup from 0) -> params unchanged
    np.testing.assert_allclose(np.asarray(new["w"]), np.ones((3, 3)))
