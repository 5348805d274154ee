"""Prefetch robustness: early consumer break must not leak/deadlock."""
import threading

import numpy as np
import pandas as pd
import pytest

from ssdx.data.dataset import DetectionDataset
from ssdx.data.pipeline import DetectionLoader


@pytest.fixture(scope="module")
def small_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("pf")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(16):
        name = f"p{i:02d}.jpg"
        cv2.imwrite(str(d / name), rng.integers(0, 255, (32, 32, 3), np.uint8))
        rows.append(dict(filename=name, width=32, height=32,
                         **{"class": "car"}, xmin=2, ymin=2, xmax=20, ymax=20))
    pd.DataFrame(rows).to_csv(d / "ann.csv", index=False)
    return d


def test_early_break_reaps_producer(small_dir):
    ds = DetectionDataset(small_dir)
    loader = DetectionLoader(ds, batch_size=4, train=False, source_size=32,
                             max_boxes=4, num_workers=2, prefetch=True)
    def producers():
        return [t for t in threading.enumerate() if t.name == "ssdx-prefetch"]

    for _ in range(3):
        it = iter(loader)
        next(it)  # consume one batch then abandon the iterator
        it.close()
    # the decode thread-pool persists by design; prefetch producers must not
    assert producers() == []


def test_full_iteration_still_works(small_dir):
    ds = DetectionDataset(small_dir)
    loader = DetectionLoader(ds, batch_size=4, train=False, source_size=32,
                             max_boxes=4, num_workers=2, prefetch=True)
    assert len(list(loader)) == 4
    assert len(list(loader)) == 4  # reusable across epochs


@pytest.fixture(scope="module")
def manybox_dir(tmp_path_factory):
    """One image with 70 boxes (past the old silent-truncation limit of 64)."""
    import cv2

    d = tmp_path_factory.mktemp("manybox")
    rng = np.random.default_rng(7)
    name = "crowded.jpg"
    cv2.imwrite(str(d / name), rng.integers(0, 255, (64, 64, 3), np.uint8))
    rows = []
    for i in range(70):
        x, y = (i % 10) * 6, (i // 10) * 8
        rows.append(dict(filename=name, width=64, height=64,
                         **{"class": "car"}, xmin=x, ymin=y, xmax=x + 5, ymax=y + 7))
    pd.DataFrame(rows).to_csv(d / "ann.csv", index=False)
    return d


def test_max_boxes_autosizes_no_gt_lost(manybox_dir):
    ds = DetectionDataset(manybox_dir)
    assert ds.max_boxes_per_image() == 70
    loader = DetectionLoader(ds, batch_size=1, train=False, source_size=64,
                             num_workers=1, prefetch=False)  # max_boxes=None -> auto
    assert loader.max_boxes == 70
    (batch, count), = list(loader)
    assert count == 1
    assert int(np.asarray(batch.gt_valid).sum()) == 70  # every GT box kept


def test_explicit_small_max_boxes_warns(manybox_dir):
    ds = DetectionDataset(manybox_dir)
    with pytest.warns(UserWarning, match="truncated"):
        loader = DetectionLoader(ds, batch_size=1, train=False, source_size=64,
                                 max_boxes=64, num_workers=1, prefetch=False)
    with pytest.warns(UserWarning, match="truncating 6 of 70"):
        list(loader)


def test_cache_images_decodes_each_once(small_dir):
    """cache_images=True: epoch 2+ hits RAM, batches stay identical."""
    ds = DetectionDataset(small_dir)
    mk = lambda cache: DetectionLoader(
        ds, batch_size=4, train=False, source_size=32, max_boxes=4,
        num_workers=2, prefetch=False, cache_images=cache)
    cached, plain = mk(True), mk(False)
    e1 = [np.asarray(b.batch.images) for b in cached]
    assert cached.stats["decoded"] == len(ds)
    e2 = [np.asarray(b.batch.images) for b in cached]
    assert cached.stats["decoded"] == len(ds)  # second epoch: all cache hits
    ref = [np.asarray(b.batch.images) for b in plain]
    assert plain.stats["decoded"] == len(ds)
    for a, b, c in zip(e1, e2, ref):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)
