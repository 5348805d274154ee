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
