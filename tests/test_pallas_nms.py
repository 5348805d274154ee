"""Pallas NMS kernel (interpret mode on CPU) vs the XLA backend and oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from ssdx.nms import batched_nms_mask


def _rand(rng, B, n):
    lo = rng.uniform(0, 250, (B, n, 2))
    sz = rng.uniform(10, 60, (B, n, 2))
    boxes = np.concatenate([lo, lo + sz], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, (B, n)).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("class_aware", [False, True])
def test_pallas_matches_xla(class_aware):
    rng = np.random.default_rng(0)
    B, n = 3, 32
    boxes, scores = _rand(rng, B, n)
    labels = rng.integers(0, 3, (B, n)).astype(np.int32)
    valid = np.ones((B, n), bool)
    valid[:, -4:] = False
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            jnp.asarray(labels))
    for thresh in (0.3, 0.5):
        xla = np.asarray(batched_nms_mask(*args, thresh, class_aware=class_aware,
                                          backend="xla"))
        pls = np.asarray(batched_nms_mask(*args, thresh, class_aware=class_aware,
                                          backend="pallas_interpret"))
        np.testing.assert_array_equal(xla, pls)


@pytest.mark.parametrize("n", [600, 1600])
def test_tiled_kernel_matches_xla_wide_k(n):
    """K > 512 dispatches to the tiled sequential-greedy kernel; must equal
    the XLA fixpoint (== exact greedy) including cross-tile suppression."""
    rng = np.random.default_rng(7)
    B = 2
    # clustered boxes force long suppression chains that span tiles
    centers = rng.uniform(30, 270, (B, 12, 2))
    pick = rng.integers(0, 12, (B, n))
    lo = centers[np.arange(B)[:, None], pick] + rng.normal(0, 6, (B, n, 2))
    sz = rng.uniform(15, 50, (B, n, 2))
    boxes = np.concatenate([lo, lo + sz], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, (B, n)).astype(np.float32)
    labels = rng.integers(0, 3, (B, n)).astype(np.int32)
    valid = np.ones((B, n), bool)
    valid[:, -7:] = False
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            jnp.asarray(labels))
    for thresh, class_aware in ((0.3, True), (0.5, False)):
        xla = np.asarray(batched_nms_mask(*args, thresh,
                                          class_aware=class_aware,
                                          backend="xla"))
        pls = np.asarray(batched_nms_mask(*args, thresh,
                                          class_aware=class_aware,
                                          backend="pallas_interpret"))
        np.testing.assert_array_equal(xla, pls)


def test_tiled_kernel_pads_non_tile_multiple():
    """K=700 (not a multiple of the 256 tile) pads with invalid slots."""
    rng = np.random.default_rng(3)
    B, n = 1, 700
    lo = rng.uniform(0, 250, (B, n, 2))
    sz = rng.uniform(10, 60, (B, n, 2))
    boxes = np.concatenate([lo, lo + sz], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, (B, n)).astype(np.float32)
    valid = np.ones((B, n), bool)
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), None)
    xla = np.asarray(batched_nms_mask(*args, 0.4, class_aware=False,
                                      backend="xla"))
    pls = np.asarray(batched_nms_mask(*args, 0.4, class_aware=False,
                                      backend="pallas_interpret"))
    np.testing.assert_array_equal(xla, pls)


def test_postprocess_pallas_backend():
    from ssdx import priors as P
    from ssdx.predict import postprocess

    priors = jnp.asarray(P.create_priors())
    rng = np.random.default_rng(1)
    loc = rng.normal(0, 0.2, (2, 8732, 4)).astype(np.float32)
    conf = rng.normal(0, 0.2, (2, 8732, 6)).astype(np.float32)
    conf[..., 0] += 4.0
    for b in range(2):
        for p in rng.choice(8732, 10, replace=False):
            conf[b, p, rng.integers(1, 6)] += 10.0
    kw = dict(score_thresh=0.2, nms_thresh=0.3, max_per_img=50,
              top_k_candidates=64)
    a = postprocess(jnp.asarray(loc), jnp.asarray(conf), priors,
                    nms_backend="xla", **kw)
    b = postprocess(jnp.asarray(loc), jnp.asarray(conf), priors,
                    nms_backend="pallas_interpret", **kw)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
