import numpy as np
import jax.numpy as jnp

from ssdx import boxes as B
from ssdx import priors as P
from ssdx.matching import build_targets

PRIORS = jnp.asarray(P.create_priors())
PRIORS_XYXY = jnp.asarray(P.priors_xyxy(np.asarray(PRIORS)))


def _pad(gt_xyxy, labels, G=8):
    n = len(gt_xyxy)
    bx = np.zeros((G, 4), np.float32)
    lb = np.zeros((G,), np.int32)
    vd = np.zeros((G,), bool)
    bx[:n] = gt_xyxy
    lb[:n] = labels
    vd[:n] = True
    return bx[None], lb[None], vd[None]


def test_exact_prior_match_is_positive():
    # GT exactly equal to a central prior (no border clamping) -> that prior
    # positive with zero offsets.  Level-0 prior at row=col=19, k=0:
    idx = (19 * 38 + 19) * 4
    gt = np.asarray(PRIORS_XYXY[idx : idx + 1])
    t = build_targets(*map(jnp.asarray, _pad(gt, [2])), PRIORS, PRIORS_XYXY, 0.5)
    assert bool(t.pos[0, idx])
    assert int(t.cls[0, idx]) == 3  # label 2 shifted by +1
    assert np.all(np.abs(np.asarray(t.loc[0, idx])) < 1e-3)


def test_empty_image_all_background():
    bx = np.zeros((1, 8, 4), np.float32)
    lb = np.zeros((1, 8), np.int32)
    vd = np.zeros((1, 8), bool)
    t = build_targets(jnp.asarray(bx), jnp.asarray(lb), jnp.asarray(vd),
                      PRIORS, PRIORS_XYXY, 0.5)
    assert not bool(t.pos.any())
    assert int(t.cls.sum()) == 0
    assert np.all(np.isfinite(np.asarray(t.loc)))


def test_forced_bipartite_match():
    # A tiny box overlapping nothing well still gets exactly one positive.
    gt = np.array([[0.481, 0.481, 0.519, 0.519]], np.float32) * 0 + np.array(
        [[0.49, 0.49, 0.493, 0.493]], np.float32)
    t = build_targets(*map(jnp.asarray, _pad(gt, [0])), PRIORS, PRIORS_XYXY, 0.5)
    assert int(np.asarray(t.pos).sum()) >= 1
    pos_idx = np.flatnonzero(np.asarray(t.pos[0]))
    assert all(int(t.cls[0, i]) == 1 for i in pos_idx)


def test_padded_gt_never_matches():
    # One real GT + padding rows filled with a large fake box; padding invalid.
    gt = np.asarray(PRIORS_XYXY[100:101])
    bx, lb, vd = _pad(gt, [1], G=4)
    bx[0, 1:] = [0.0, 0.0, 1.0, 1.0]  # huge invalid box
    lb[0, 1:] = 4
    t = build_targets(jnp.asarray(bx), jnp.asarray(lb), jnp.asarray(vd),
                      PRIORS, PRIORS_XYXY, 0.5)
    # all positive priors must carry label 1+1=2, never the padded label 5
    labels = np.asarray(t.cls[0])[np.asarray(t.pos[0])]
    assert len(labels) >= 1 and set(labels.tolist()) == {2}


def test_batched_and_matches_reference_oracle():
    """Compare against a direct per-image numpy transcription of the matching
    semantics (forced bipartite + threshold), on random GT."""
    rng = np.random.default_rng(7)
    Bsz, G = 3, 5
    lo = rng.uniform(0, 0.7, (Bsz, G, 2))
    sz = rng.uniform(0.05, 0.3, (Bsz, G, 2))
    bx = np.concatenate([lo, np.minimum(lo + sz, 1.0)], axis=-1).astype(np.float32)
    lb = rng.integers(0, 5, (Bsz, G)).astype(np.int32)
    vd = np.ones((Bsz, G), bool)
    vd[:, 3:] = False

    t = build_targets(jnp.asarray(bx), jnp.asarray(lb), jnp.asarray(vd),
                      PRIORS, PRIORS_XYXY, 0.4)

    pri_xyxy = np.asarray(PRIORS_XYXY)
    for b in range(Bsz):
        good = bx[b][vd[b]]
        iou = np.asarray(B.pairwise_ciou(jnp.asarray(pri_xyxy), jnp.asarray(good))).copy()
        best_prior = iou.argmax(axis=0)
        iou[best_prior, np.arange(len(good))] = 2.0
        best_gt = iou.argmax(axis=1)
        best_iou = iou.max(axis=1)
        pos = best_iou >= 0.4
        np.testing.assert_array_equal(np.asarray(t.pos[b]), pos)
        exp_cls = np.where(pos, lb[b][vd[b]][best_gt] + 1, 0)
        np.testing.assert_array_equal(np.asarray(t.cls[b]), exp_cls)
