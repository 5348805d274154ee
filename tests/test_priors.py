import numpy as np

from ssdx import priors as P


def _oracle_priors():
    """Straightforward loop implementation of the SSD-paper prior recipe
    (independent of ssdx.priors' vectorized construction)."""
    fmaps = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    ars = [[2], [2, 3], [2, 3], [2, 3], [2], [2]]
    L = len(fmaps)
    s = [0.2 + (0.9 - 0.2) * l / (L - 1) for l in range(L)] + [1.0]
    out = []
    for l, (H, W) in enumerate(fmaps):
        whs = [(s[l], s[l]), (np.sqrt(s[l] * s[l + 1]),) * 2]
        for a in ars[l]:
            r = np.sqrt(a)
            whs.append((s[l] * r, s[l] / r))
            whs.append((s[l] / r, s[l] * r))
        for i in range(H):
            cy = (i + 0.5) / H
            for j in range(W):
                cx = (j + 0.5) / W
                for w, h in whs:
                    out.append([cx, cy, w, h])
    arr = np.asarray(out, dtype=np.float32)
    arr[:, 0:2] = np.clip(arr[:, 0:2], 0, 1)
    arr[:, 2:4] = np.clip(arr[:, 2:4], 1e-6, 1)
    return arr


def test_count_is_8732():
    assert P.NUM_PRIORS == 8732
    assert P.create_priors().shape == (8732, 4)


def test_boxes_per_location():
    assert P.BOXES_PER_LOCATION == (4, 6, 6, 6, 4, 4)


def test_matches_oracle_exactly():
    np.testing.assert_allclose(P.create_priors(), _oracle_priors(), atol=1e-7)


def test_first_prior_values():
    pri = P.create_priors()
    np.testing.assert_allclose(
        pri[0], [0.5 / 38, 0.5 / 38, 0.2, 0.2], atol=1e-7)
    np.testing.assert_allclose(pri[1, 2], np.sqrt(0.2 * 0.34), atol=1e-6)


def test_clipping():
    pri = P.create_priors()
    assert pri[:, 0:2].min() >= 0 and pri[:, 0:2].max() <= 1
    assert pri[:, 2:4].min() > 0 and pri[:, 2:4].max() <= 1
    xyxy = P.priors_xyxy(pri)
    assert xyxy.min() >= 0 and xyxy.max() <= 1
    assert np.all(xyxy[:, 2] >= xyxy[:, 0]) and np.all(xyxy[:, 3] >= xyxy[:, 1])


def test_level_offsets():
    # Per-level prior counts: k * H * W.
    counts = [k * h * w for k, (h, w) in zip(P.BOXES_PER_LOCATION, P.FEATURE_MAP_SIZES)]
    assert counts == [5776, 2166, 600, 150, 36, 4]
    assert sum(counts) == 8732
