import numpy as np
import jax.numpy as jnp

from ssdx import boxes as B


def _np_iou_matrix(a, b):
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            ix1 = max(a[i, 0], b[j, 0])
            iy1 = max(a[i, 1], b[j, 1])
            ix2 = min(a[i, 2], b[j, 2])
            iy2 = min(a[i, 3], b[j, 3])
            inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
            area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            out[i, j] = inter / (area_a + area_b - inter + 1e-7)
    return out


def _np_diou_matrix(a, b):
    iou = _np_iou_matrix(a, b)
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            cx1 = max(a[i, 2], b[j, 2]) - min(a[i, 0], b[j, 0])
            cy1 = max(a[i, 3], b[j, 3]) - min(a[i, 1], b[j, 1])
            diag2 = cx1**2 + cy1**2
            ca = ((a[i, 0] + a[i, 2]) / 2, (a[i, 1] + a[i, 3]) / 2)
            cb = ((b[j, 0] + b[j, 2]) / 2, (b[j, 1] + b[j, 3]) / 2)
            d2 = (ca[0] - cb[0]) ** 2 + (ca[1] - cb[1]) ** 2
            out[i, j] = iou[i, j] - d2 / (diag2 + 1e-7)
    return out


def _np_ciou_matrix(a, b):
    diou = _np_diou_matrix(a, b)
    iou = _np_iou_matrix(a, b)
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            wa, ha = a[i, 2] - a[i, 0], a[i, 3] - a[i, 1]
            wb, hb = b[j, 2] - b[j, 0], b[j, 3] - b[j, 1]
            v = (4 / np.pi**2) * (np.arctan(wb / hb) - np.arctan(wa / ha)) ** 2
            alpha = v / (1 - iou[i, j] + v + 1e-7)
            out[i, j] = diou[i, j] - alpha * v
    return out


def _rand_boxes(rng, n):
    lo = rng.uniform(0, 0.8, size=(n, 2))
    sz = rng.uniform(0.05, 0.2, size=(n, 2))
    return np.concatenate([lo, lo + sz], axis=1).astype(np.float32)


def test_convert_roundtrip():
    rng = np.random.default_rng(0)
    xyxy = _rand_boxes(rng, 64)
    back = B.cxcywh_to_xyxy(B.xyxy_to_cxcywh(jnp.asarray(xyxy)))
    np.testing.assert_allclose(np.asarray(back), xyxy, atol=1e-6)


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0], [5.0, 5.0, 6.0, 6.0]])
    iou = np.asarray(B.pairwise_iou(a, b))
    np.testing.assert_allclose(iou[0], [1 / 7, 1.0, 0.0], atol=1e-6)


def test_iou_family_vs_oracle():
    rng = np.random.default_rng(1)
    a, b = _rand_boxes(rng, 13), _rand_boxes(rng, 7)
    np.testing.assert_allclose(
        np.asarray(B.pairwise_iou(jnp.asarray(a), jnp.asarray(b))),
        _np_iou_matrix(a, b), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(B.pairwise_diou(jnp.asarray(a), jnp.asarray(b))),
        _np_diou_matrix(a, b), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(B.pairwise_ciou(jnp.asarray(a), jnp.asarray(b))),
        _np_ciou_matrix(a, b), atol=1e-4)


def test_diou_identical_boxes_is_one():
    a = jnp.array([[0.1, 0.1, 0.4, 0.5]])
    assert np.isclose(np.asarray(B.pairwise_diou(a, a))[0, 0], 1.0, atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(2)
    priors = np.concatenate(
        [rng.uniform(0.2, 0.8, (100, 2)), rng.uniform(0.05, 0.3, (100, 2))], axis=1
    ).astype(np.float32)
    gt = np.concatenate(
        [rng.uniform(0.2, 0.8, (100, 2)), rng.uniform(0.05, 0.3, (100, 2))], axis=1
    ).astype(np.float32)
    t = B.encode(jnp.asarray(gt), jnp.asarray(priors))
    back = B.decode(t, jnp.asarray(priors))
    np.testing.assert_allclose(np.asarray(back), gt, atol=1e-4)


def test_encode_exact_match_is_zero():
    p = jnp.array([[0.5, 0.5, 0.2, 0.3]])
    t = np.asarray(B.encode(p, p))
    np.testing.assert_allclose(t, np.zeros((1, 4)), atol=1e-6)


def test_batched_leading_dims():
    rng = np.random.default_rng(3)
    a = jnp.asarray(np.stack([_rand_boxes(rng, 5) for _ in range(4)]))
    b = jnp.asarray(np.stack([_rand_boxes(rng, 6) for _ in range(4)]))
    out = B.pairwise_ciou(a, b)
    assert out.shape == (4, 5, 6)
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(out[i]), _np_ciou_matrix(np.asarray(a[i]), np.asarray(b[i])),
            atol=1e-4)
