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


# ---------------------------------------------------------------------------
# Plateau scheduler (the reference's sched_step_w_opt=False intent,
# SSD_trainer.py:383-384): per-epoch ReduceLROnPlateau on validation loss.
# ---------------------------------------------------------------------------


def test_reduce_on_plateau_matches_torch_oracle():
    """Same LR trajectory as torch.optim.lr_scheduler.ReduceLROnPlateau for
    an arbitrary loss sequence (mode='min', rel threshold)."""
    torch = pytest.importorskip("torch")

    from ssdx.train.schedule import ReduceOnPlateau

    losses = [1.0, 0.9, 0.8, 0.81, 0.82, 0.80, 0.805, 0.79, 0.795, 0.80,
              0.81, 0.80, 0.80, 0.80, 0.80, 0.78, 0.80, 0.80, 0.80, 0.80]
    for patience, factor, cooldown in [(2, 0.5, 0), (3, 0.1, 1), (1, 0.2, 2)]:
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-2)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=factor, patience=patience,
            threshold=1e-4, cooldown=cooldown, min_lr=1e-5)
        ours = ReduceOnPlateau(base_lr=1e-2, factor=factor, patience=patience,
                               threshold=1e-4, cooldown=cooldown, min_lr=1e-5)
        for i, loss in enumerate(losses):
            tsched.step(loss)
            lr = ours.step(loss)
            assert np.isclose(lr, opt.param_groups[0]["lr"], rtol=1e-7), (
                patience, factor, cooldown, i)


def test_plateau_optimizer_lr_injection():
    """scheduler='plateau': constant base_lr lives in opt_state; host-side
    set_learning_rate changes the applied step size without rebuilding."""
    import jax.numpy as jnp
    import optax

    from ssdx.train.schedule import (ReduceOnPlateau, get_learning_rate,
                                     set_learning_rate)

    tx, ctrl = build_optimizer(
        steps_per_epoch=10, scheduler="plateau", base_lr=1e-2,
        weight_decay=0.0, momentum=0.0, plateau_factor=0.5,
        plateau_patience=1,
    )
    assert isinstance(ctrl, ReduceOnPlateau)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    assert np.isclose(get_learning_rate(st), 1e-2)
    g = {"w": jnp.ones((3,))}
    up, st = tx.update(g, st, params)
    np.testing.assert_allclose(np.asarray(up["w"]), -1e-2 * np.ones(3), rtol=1e-6)

    # plateau fires after patience+1 bad epochs -> lr halves in the state
    ctrl.step(1.0)
    for _ in range(2):
        lr = ctrl.step(1.0)
    assert np.isclose(lr, 5e-3)
    st = set_learning_rate(st, lr)
    up, st = tx.update(g, st, params)
    np.testing.assert_allclose(np.asarray(up["w"]), -5e-3 * np.ones(3), rtol=1e-6)


def test_build_optimizer_rejects_unknown_scheduler():
    with pytest.raises(ValueError):
        build_optimizer(steps_per_epoch=10, scheduler="nope")
