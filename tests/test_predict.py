import numpy as np
import jax.numpy as jnp

from ssdx import boxes as B
from ssdx import priors as P
from ssdx.predict import postprocess, to_pylist

PRIORS = jnp.asarray(P.create_priors())


def _np_softmax(x):
    z = x - x.max(-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(-1, keepdims=True)


def _np_diou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    iou = inter / (area + 1e-7)
    ex1, ey1 = min(a[0], b[0]), min(a[1], b[1])
    ex2, ey2 = max(a[2], b[2]), max(a[3], b[3])
    diag2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    d2 = ((a[0] + a[2] - b[0] - b[2]) / 2) ** 2 + ((a[1] + a[3] - b[1] - b[3]) / 2) ** 2
    return iou - d2 / (diag2 + 1e-7)


def _oracle_predict(loc, conf, priors, score_thresh, nms_thresh, max_per_img):
    """Direct transcription of the reference predict flow
    (SSD_from_scratch.py:388-474): threshold -> decode survivors -> per-class
    greedy DIoU-NMS -> global score sort -> truncate."""
    Bsz = conf.shape[0]
    scores_all = _np_softmax(conf)[..., 1:]
    out = []
    for b in range(Bsz):
        s = scores_all[b]
        pri_idx, cls_idx = np.nonzero(s > score_thresh)
        if len(pri_idx) == 0:
            out.append({"labels": np.zeros(0, np.int64),
                        "scores": np.zeros(0, np.float32),
                        "boxes": np.zeros((0, 4), np.float32)})
            continue
        pr = priors[pri_idx]
        lc = loc[b, pri_idx]
        cx = lc[:, 0] * 0.1 * pr[:, 2] + pr[:, 0]
        cy = lc[:, 1] * 0.1 * pr[:, 3] + pr[:, 1]
        w = pr[:, 2] * np.exp(lc[:, 2] * 0.2)
        h = pr[:, 3] * np.exp(lc[:, 3] * 0.2)
        x1 = np.clip(cx - w / 2, 0, 1) * 300
        y1 = np.clip(cy - h / 2, 0, 1) * 300
        x2 = np.clip(cx + w / 2, 0, 1) * 300
        y2 = np.clip(cy + h / 2, 0, 1) * 300
        boxes = np.stack([x1, y1, x2, y2], 1)
        sc = s[pri_idx, cls_idx]
        keep_all = []
        for c in np.unique(cls_idx):
            idx = np.flatnonzero(cls_idx == c)
            order = list(idx[np.argsort(-sc[idx])])
            while order:
                i = order.pop(0)
                keep_all.append(i)
                order = [j for j in order
                         if _np_diou(boxes[i], boxes[j]) <= nms_thresh]
        keep_all = np.asarray(keep_all)
        keep_all = keep_all[np.argsort(-sc[keep_all], kind="stable")][:max_per_img]
        out.append({"labels": cls_idx[keep_all].astype(np.int64),
                    "scores": sc[keep_all].astype(np.float32),
                    "boxes": boxes[keep_all].astype(np.float32)})
    return out


def _synthetic_logits(rng, Bsz=2, C=6, n_hot=12):
    """Random logits with a few confident detections per image."""
    loc = rng.normal(0, 0.3, (Bsz, 8732, 4)).astype(np.float32)
    conf = rng.normal(0, 0.3, (Bsz, 8732, C)).astype(np.float32)
    conf[..., 0] += 4.0  # mostly background
    for b in range(Bsz):
        hot = rng.choice(8732, n_hot, replace=False)
        for p in hot:
            c = rng.integers(1, C)
            conf[b, p, c] += 10.0
    return loc, conf


def test_matches_reference_oracle():
    rng = np.random.default_rng(0)
    loc, conf = _synthetic_logits(rng)
    det = postprocess(jnp.asarray(loc), jnp.asarray(conf), PRIORS,
                      score_thresh=0.2, nms_thresh=0.3, max_per_img=100)
    got = to_pylist(det)
    exp = _oracle_predict(loc, conf, np.asarray(PRIORS), 0.2, 0.3, 100)
    for g, e in zip(got, exp):
        assert len(g["labels"]) == len(e["labels"])
        # sort both by (score desc) — ties may order differently
        gi = np.argsort(-g["scores"], kind="stable")
        ei = np.argsort(-e["scores"], kind="stable")
        np.testing.assert_allclose(g["scores"][gi], e["scores"][ei], atol=1e-5)
        np.testing.assert_array_equal(g["labels"][gi], e["labels"][ei])
        np.testing.assert_allclose(g["boxes"][gi], e["boxes"][ei], atol=1e-2)


def test_empty_image():
    conf = np.zeros((1, 8732, 6), np.float32)
    conf[..., 0] = 10.0
    det = postprocess(jnp.zeros((1, 8732, 4)), jnp.asarray(conf), PRIORS,
                      score_thresh=0.2, nms_thresh=0.3)
    assert not bool(det.valid.any())
    assert to_pylist(det)[0]["boxes"].shape == (0, 4)


def test_max_per_img_truncation():
    rng = np.random.default_rng(1)
    loc, conf = _synthetic_logits(rng, Bsz=1, n_hot=30)
    det = postprocess(jnp.asarray(loc), jnp.asarray(conf), PRIORS,
                      score_thresh=0.05, nms_thresh=0.9, max_per_img=5)
    n = int(np.asarray(det.valid).sum())
    assert n <= 5
    # outputs are score-sorted descending
    s = np.asarray(det.scores[0])[: n]
    assert np.all(np.diff(s) <= 1e-7)


def test_thresh_validation():
    import pytest
    with pytest.raises(ValueError):
        postprocess(jnp.zeros((1, 8732, 4)), jnp.zeros((1, 8732, 6)), PRIORS,
                    score_thresh=1.5)
    with pytest.raises(ValueError):
        postprocess(jnp.zeros((1, 8732, 4)), jnp.zeros((1, 8732, 6)), PRIORS,
                    nms_thresh=0.0)
