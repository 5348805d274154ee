"""Fused-Pallas-stem train step == XLA train step (full width, f32).

The train-mode Pallas stem (ssdx/ops/pallas_stem_train.py) is specialized
to the full-width 300x300 stem, so unlike the other step tests this one
must pay the full SSD300 fwd+bwd XLA:CPU compile — it is deliberately a
single step at B=1.  In float32 the fused step must reproduce the XLA
step's loss, updated parameters, and running batch statistics to ~1e-4.
Kernel-level parity (forward, stats, every parameter gradient) lives in
tests/test_stem_train.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ssdx import priors as P
from ssdx.model import SSD300
from ssdx.train.schedule import build_optimizer
from ssdx.train.step import Batch, create_train_state, make_train_step

PRIORS = jnp.asarray(P.create_priors())
PRIORS_XYXY = jnp.asarray(P.priors_xyxy(np.asarray(PRIORS)))


def _batch(rng, B=1, G=4):
    images = rng.normal(0, 1, (B, 300, 300, 3)).astype(np.float32)
    lo = rng.uniform(0.1, 0.5, (B, G, 2))
    sz = rng.uniform(0.1, 0.4, (B, G, 2))
    boxes = np.concatenate([lo, np.minimum(lo + sz, 1.0)], -1).astype(np.float32)
    labels = rng.integers(0, 5, (B, G)).astype(np.int32)
    valid = np.ones((B, G), bool)
    return Batch(images=jnp.asarray(images), gt_boxes=jnp.asarray(boxes),
                 gt_labels=jnp.asarray(labels), gt_valid=jnp.asarray(valid))


def test_fused_step_matches_xla_step_f32():
    model = SSD300(num_classes=6, dtype=jnp.float32)
    tx, _ = build_optimizer(steps_per_epoch=10, max_epochs=2,
                            warmup_epochs=0, base_lr=1e-2)
    state0 = create_train_state(model, tx, jax.random.key(0))
    batch = _batch(np.random.default_rng(0))

    step_xla = make_train_step(model, tx, PRIORS, PRIORS_XYXY,
                               iou_thresh=0.4, fused_stem=False)
    step_fused = make_train_step(model, tx, PRIORS, PRIORS_XYXY,
                                 iou_thresh=0.4, fused_stem=True)

    sa, ma = step_xla(state0, batch)
    # state0 was donated — rebuild it identically for the second run
    state0 = create_train_state(model, tx, jax.random.key(0))
    sb, mb = step_fused(state0, batch)

    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-3 * max(
        1.0, abs(float(ma["loss"])))

    # L2-relative comparison: ~1e-7 forward accumulation-order deltas flip
    # isolated ReLU/pool routing decisions, which moves sparse gradient
    # entries by O(1) locally (true of ANY reformulated conv); the bulk of
    # the update must still agree to well under 1%.  Stem conv biases are
    # excluded: the fused op returns their analytically-exact zero gradient
    # (train-mode BN subtracts the batch mean) where autodiff returns
    # reduction noise.
    flat_a = jax.tree.leaves_with_path(sa.params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree.leaves_with_path(sb.params)}
    # (the 1e-3 norm floor also skips every BN-shadowed conv bias, whose
    # one-step update is pure gradient noise ~1e-8 in both paths)
    for k, va in flat_a:
        ks = jax.tree_util.keystr(k)
        vb = flat_b[ks]
        va = np.asarray(va).ravel()
        vb = np.asarray(vb).ravel()
        rel = np.linalg.norm(va - vb) / max(np.linalg.norm(va), 1e-3)
        assert rel < 1e-2, (ks, rel)

    for name in ("ConvBNRelu_0", "ConvBNRelu_1", "ConvBNRelu_2"):
        for stat in ("mean", "var"):
            va = np.asarray(sa.batch_stats[name]["BatchNorm_0"][stat])
            vb = np.asarray(sb.batch_stats[name]["BatchNorm_0"][stat])
            rel = np.abs(va - vb).max() / (np.abs(va).max() + 1e-6)
            assert rel < 1e-4, (name, stat, rel)

    # pytree structure must be identical (feeding sb back must not recompile)
    assert jax.tree.structure(sa) == jax.tree.structure(sb)


def test_fused_step_mesh_matches_single_device_f32():
    """shard_mapped fused stem under a 2-device virtual mesh: psum'd batch
    statistics and parameter gradients must reproduce the single-device
    fused step on the same global batch (the fused analog of
    tests/test_sync_bn.py).

    2 devices, not 8: this test must pay the full-width f32 fwd+bwd compile
    TWICE (the fused stem is specialized to the full 300x300 stem), and on
    this 1-core host the 8-shard variant alone cost ~9 min of suite time.
    The psum plumbing being proven here is device-count-independent;
    8-device mesh coverage lives in tests/test_sync_bn.py,
    tests/test_train_step.py, and the driver's dryrun_multichip(8)."""
    from ssdx.mesh import create_mesh, shard_batch

    model = SSD300(num_classes=6, dtype=jnp.float32)
    tx, _ = build_optimizer(steps_per_epoch=10, max_epochs=2,
                            warmup_epochs=0, base_lr=1e-2)
    batch = _batch(np.random.default_rng(1), B=2)

    state0 = create_train_state(model, tx, jax.random.key(0))
    step_1d = make_train_step(model, tx, PRIORS, PRIORS_XYXY,
                              iou_thresh=0.4, fused_stem=True)
    sa, ma = step_1d(state0, batch)

    mesh = create_mesh(jax.devices()[:2])
    assert mesh.devices.size == 2
    state0 = create_train_state(model, tx, jax.random.key(0))
    step_8d = make_train_step(model, tx, PRIORS, PRIORS_XYXY,
                              iou_thresh=0.4, mesh=mesh, fused_stem=True)
    sb, mb = step_8d(state0, shard_batch(batch, mesh))

    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-3 * max(
        1.0, abs(float(ma["loss"])))
    for name in ("ConvBNRelu_0", "ConvBNRelu_1"):
        for stat in ("mean", "var"):
            va = np.asarray(sa.batch_stats[name]["BatchNorm_0"][stat])
            vb = np.asarray(sb.batch_stats[name]["BatchNorm_0"][stat])
            rel = np.abs(va - vb).max() / (np.abs(va).max() + 1e-6)
            assert rel < 1e-4, (name, stat, rel)
    flat_a = jax.tree.leaves_with_path(sa.params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree.leaves_with_path(sb.params)}
    # 2e-2: single-device vs sharded reduction orders flip slightly more
    # routing decisions than the same-device comparison above; a psum bug
    # would show as ~Nx (rel ~1), not percent-level
    for k, va in flat_a:
        ks = jax.tree_util.keystr(k)
        va = np.asarray(va).ravel()
        vb = np.asarray(flat_b[ks]).ravel()
        rel = np.linalg.norm(va - vb) / max(np.linalg.norm(va), 1e-3)
        assert rel < 2e-2, (ks, rel)
