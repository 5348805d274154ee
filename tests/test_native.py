"""Native C++ kernels: build, exactness vs numpy oracles, mAP wiring."""
import numpy as np
import pytest

from ssdx.ops import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain available"
)


def _rand_boxes(rng, n, lo=0, hi=250, smin=10, smax=60):
    xy = rng.uniform(lo, hi, (n, 2))
    wh = rng.uniform(smin, smax, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def _np_iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def test_match_detections_vs_python():
    rng = np.random.default_rng(0)
    for _ in range(10):
        det = _rand_boxes(rng, 12)
        gt = _rand_boxes(rng, 5)
        tp_native = native.match_detections(det, gt, 0.5)
        # python oracle
        matched = np.zeros(len(gt), bool)
        tp_py = np.zeros(len(det), np.uint8)
        for d in range(len(det)):
            best, bg = -1.0, -1
            for g in range(len(gt)):
                if matched[g]:
                    continue
                v = _np_iou(det[d], gt[g])
                if v > best:
                    best, bg = v, g
            if bg >= 0 and best >= 0.5:
                matched[bg] = True
                tp_py[d] = 1
        np.testing.assert_array_equal(tp_native, tp_py)


def test_match_empty_cases():
    det = _rand_boxes(np.random.default_rng(1), 3)
    assert native.match_detections(det, np.zeros((0, 4), np.float32), 0.5).sum() == 0
    assert len(native.match_detections(np.zeros((0, 4), np.float32), det, 0.5)) == 0


def test_match_detections_ignore_vs_numpy_oracle():
    """The C++ ignore-aware matcher must agree with the numpy oracle
    (_match_with_ignore) on random cases across area-range ignore masks."""
    from ssdx.eval.map import _match_with_ignore

    rng = np.random.default_rng(7)
    for trial in range(20):
        nd, ng = int(rng.integers(0, 15)), int(rng.integers(0, 8))
        det = _rand_boxes(rng, nd)
        # half the GTs overlap detections so matches actually occur
        gt = np.concatenate([det[: min(nd, ng)] + rng.normal(0, 4, (min(nd, ng), 4)).astype(np.float32),
                             _rand_boxes(rng, max(0, ng - min(nd, ng)))])
        gt = gt[:ng]
        gt_ig = rng.uniform(size=ng) < 0.4
        for thresh in (0.3, 0.5, 1.0):
            tp_n, mig_n = native.match_detections_ignore(det, gt, gt_ig, thresh)
            tp_p, mig_p = _match_with_ignore(det, gt, gt_ig, thresh)
            np.testing.assert_array_equal(tp_n, tp_p)
            np.testing.assert_array_equal(mig_n, mig_p)


def test_nms_diou_vs_jax_impl():
    import jax.numpy as jnp

    from ssdx.nms import nms_mask

    rng = np.random.default_rng(2)
    for _ in range(5):
        boxes = _rand_boxes(rng, 30)
        scores = rng.uniform(0, 1, 30).astype(np.float32)
        for thresh in (0.3, 0.5):
            keep_native = set(native.nms_diou(boxes, scores, thresh).tolist())
            keep_jax = set(
                np.flatnonzero(
                    np.asarray(
                        nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                 jnp.ones(30, bool), thresh)
                    )
                ).tolist()
            )
            assert keep_native == keep_jax


def test_map_native_matches_numpy_path():
    from ssdx.eval.map import MeanAP

    rng = np.random.default_rng(3)
    preds, targets = [], []
    for _ in range(6):
        gt = _rand_boxes(rng, 4)
        det = np.concatenate([gt + rng.normal(0, 3, gt.shape), _rand_boxes(rng, 3)])
        scores = rng.uniform(0.1, 1, len(det)).astype(np.float32)
        labels = rng.integers(0, 3, len(det))
        preds.append({"boxes": det, "scores": scores, "labels": labels})
        targets.append({"boxes": gt, "labels": rng.integers(0, 3, len(gt))})

    m_native = MeanAP()
    m_native.update(preds, targets)
    out_native = m_native.compute()

    # force the numpy path
    import ssdx.eval.map as mapmod

    orig = mapmod._native.available
    mapmod._native.available = lambda: False
    try:
        m_np = MeanAP()
        m_np.update(preds, targets)
        out_np = m_np.compute()
    finally:
        mapmod._native.available = orig

    assert np.isclose(out_native["map_50"], out_np["map_50"])
    np.testing.assert_allclose(out_native["map_per_class"], out_np["map_per_class"])
