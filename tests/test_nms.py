import numpy as np
import jax.numpy as jnp

from ssdx.nms import nms_mask, batched_nms_mask


def _np_diou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    iou = inter / (area + 1e-7)
    ex1, ey1 = min(a[0], b[0]), min(a[1], b[1])
    ex2, ey2 = max(a[2], b[2]), max(a[3], b[3])
    diag2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    ca = ((a[0] + a[2]) / 2, (a[1] + a[3]) / 2)
    cb = ((b[0] + b[2]) / 2, (b[1] + b[3]) / 2)
    d2 = (ca[0] - cb[0]) ** 2 + (ca[1] - cb[1]) ** 2
    return iou - d2 / (diag2 + 1e-7)


def _oracle_nms(boxes, scores, thresh):
    """Greedy DIoU-NMS exactly as the reference while-loop
    (SSD_from_scratch.py:664-692)."""
    order = list(np.argsort(-scores))
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        order = [j for j in order if _np_diou(boxes[i], boxes[j]) <= thresh]
    return sorted(keep)


def _rand(rng, n):
    lo = rng.uniform(0, 250, (n, 2))
    sz = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([lo, lo + sz], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_vs_oracle_random():
    rng = np.random.default_rng(0)
    for trial in range(5):
        boxes, scores = _rand(rng, 40)
        for thresh in (0.3, 0.5, 0.7):
            keep = nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.ones(40, bool), thresh)
            got = sorted(np.flatnonzero(np.asarray(keep)).tolist())
            assert got == _oracle_nms(boxes, scores, thresh)


def test_invalid_never_kept_nor_suppressing():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.array([False, True, True])
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.asarray(valid), 0.5))
    # box 0 invalid: not kept, and must not suppress box 1
    assert keep.tolist() == [False, True, True]


def test_class_offsets_prevent_cross_class_suppression():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([0, 1], np.int32)
    keep_agnostic = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                        jnp.ones(2, bool), 0.5))
    keep_aware = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.ones(2, bool), 0.5, jnp.asarray(labels)))
    assert keep_agnostic.tolist() == [True, False]
    assert keep_aware.tolist() == [True, True]


def test_batched_matches_single():
    rng = np.random.default_rng(1)
    bx, sc = [], []
    for _ in range(3):
        b, s = _rand(rng, 25)
        bx.append(b)
        sc.append(s)
    bx, sc = np.stack(bx), np.stack(sc)
    labels = rng.integers(0, 3, (3, 25)).astype(np.int32)
    valid = np.ones((3, 25), bool)
    batched = np.asarray(batched_nms_mask(
        jnp.asarray(bx), jnp.asarray(sc), jnp.asarray(valid),
        jnp.asarray(labels), 0.4, class_aware=True))
    for i in range(3):
        single = np.asarray(nms_mask(jnp.asarray(bx[i]), jnp.asarray(sc[i]),
                                     jnp.ones(25, bool), 0.4, jnp.asarray(labels[i])))
        np.testing.assert_array_equal(batched[i], single)
