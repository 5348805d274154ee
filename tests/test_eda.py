import numpy as np
import pandas as pd
import pytest

from ssdx.data.dataset import DetectionDataset
from ssdx.data.eda import augmented_area_stats, dataset_stats


@pytest.fixture(scope="module")
def stats_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("eda")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        name = f"e{i:02d}.jpg"
        cv2.imwrite(str(d / name), rng.integers(0, 255, (64, 64, 3), np.uint8))
        if i == 11:
            rows.append(dict(filename=name, width=64, height=64,
                             **{"class": "empty"}, xmin=0, ymin=0, xmax=0, ymax=0))
            continue
        for _ in range(2):
            rows.append(dict(filename=name, width=64, height=64,
                             **{"class": "car" if i % 2 else "truck"},
                             xmin=4, ymin=4, xmax=20, ymax=20))
    pd.DataFrame(rows).to_csv(d / "ann.csv", index=False)
    return d


def test_dataset_stats(stats_dir):
    ds = DetectionDataset(stats_dir)
    out = dataset_stats(ds)
    assert out["n_images"] == 12
    assert out["n_boxes"] == 22
    assert out["class_counts"] == {"car": 10, "truck": 12}
    assert out["objects_per_image"]["empty_images"] == 1
    assert out["objects_per_image"]["max"] == 2
    # 16x16 boxes on 64x64 canvas -> area_frac = 256/4096 = 0.0625
    assert np.isclose(out["area_frac"]["median"], 0.0625, atol=1e-4)


def test_augmented_area_stats(stats_dir):
    ds = DetectionDataset(stats_dir)
    out = augmented_area_stats(ds, n_batches=2, batch_size=4)
    assert out["n_boxes_sampled"] > 0
    # the conditional crop zooms in: augmented fractions >= raw median
    assert out["median"] >= 0.02
