import numpy as np
import pandas as pd
import pytest

from ssdx.data.dataset import DetectionDataset, scan_directory
from ssdx.data.pipeline import DetectionLoader, bootstrap_indices, bootstrap_repeats
from ssdx.data.split import make_train_test_split


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    """Synthetic 24-image dataset: 64x64 jpgs + one annotation csv."""
    import cv2

    d = tmp_path_factory.mktemp("toy")
    rng = np.random.default_rng(0)
    rows = []
    classes = ["car", "pedestrian", "truck"]
    for i in range(24):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        name = f"img_{i:03d}.jpg"
        cv2.imwrite(str(d / name), img)
        if i % 6 == 5:
            rows.append(dict(filename=name, width=64, height=64, **{"class": "empty"},
                             xmin=0, ymin=0, xmax=0, ymax=0))
            continue
        for _ in range(rng.integers(1, 4)):
            x, y = rng.integers(0, 40, 2)
            w, h = rng.integers(8, 20, 2)
            rows.append(dict(filename=name, width=64, height=64,
                             **{"class": classes[rng.integers(0, 3)]},
                             xmin=int(x), ymin=int(y), xmax=int(x + w), ymax=int(y + h)))
    pd.DataFrame(rows).to_csv(d / "annotations.csv", index=False)
    return d


def test_scan_and_classes(toy_dir):
    ds = DetectionDataset(toy_dir)
    assert len(ds) == 24
    assert ds.classes == ["car", "pedestrian", "truck"]  # 'empty' removed, sorted
    assert ds.class_to_idx == {"car": 0, "pedestrian": 1, "truck": 2}


def test_getitem_contract(toy_dir):
    ds = DetectionDataset(toy_dir, include_area=True)
    img, tgt = ds[0]
    assert img.dtype == np.uint8 and img.shape == (64, 64, 3)
    assert tgt["boxes"].dtype == np.float32 and tgt["boxes"].shape[1] == 4
    assert tgt["labels"].dtype == np.int64
    assert tgt["image_id"][0] == 0
    assert len(tgt["areas"]) == len(tgt["labels"])


def test_background_image(toy_dir):
    ds = DetectionDataset(toy_dir)
    # images i % 6 == 5 are 'empty'
    idx = [i for i, p in enumerate(ds.paths) if p.name == "img_005.jpg"][0]
    boxes, labels = ds.annotations(idx)
    assert boxes.shape == (0, 4) and labels.shape == (0,)


def test_file_pct_subsample(toy_dir):
    ds = DetectionDataset(toy_dir, file_pct=0.5, rand_seed=724)
    assert len(ds) == 12
    ds2 = DetectionDataset(toy_dir, file_pct=0.5, rand_seed=724)
    assert [p.name for p in ds.paths] == [p.name for p in ds2.paths]
    with pytest.raises(TypeError):
        DetectionDataset(toy_dir, file_pct=1.5)


def test_file_list(toy_dir):
    names = ["img_000.jpg", "img_001.jpg"]
    ds = DetectionDataset(toy_dir, file_list=names)
    assert len(ds) == 2
    assert set(ds.annotate_df["filename"]) <= set(names)


def test_split_disjoint_groups(toy_dir):
    full = DetectionDataset(toy_dir)
    tr, te = make_train_test_split(full, test_size=0.25)
    tr_names = {p.name for p in tr.paths}
    te_names = {p.name for p in te.paths}
    assert not (tr_names & te_names)
    assert len(tr) + len(te) >= 20  # 'empty'-only files may drop from the csv split


def test_bootstrap_policy():
    assert [bootstrap_repeats(n) for n in [0, 1, 2, 3, 6, 7, 9, 10, 50]] == \
        [1, 2, 2, 3, 3, 4, 4, 5, 5]


def test_bootstrap_indices(toy_dir):
    ds = DetectionDataset(toy_dir)
    idx = bootstrap_indices(ds)
    assert len(idx) >= len(ds)
    counts = np.bincount(idx, minlength=len(ds))
    for i in range(len(ds)):
        _, labels = ds.annotations(i)
        assert counts[i] == bootstrap_repeats(len(labels))


def test_train_loader_shapes(toy_dir):
    ds = DetectionDataset(toy_dir)
    loader = DetectionLoader(ds, batch_size=8, train=True, source_size=64,
                             max_boxes=8, num_workers=2, prefetch=False)
    items = list(loader)
    assert len(items) == 3  # 24 // 8, partial dropped
    b = items[0].batch
    assert b.images.shape == (8, 300, 300, 3)
    assert b.gt_boxes.shape == (8, 8, 4)
    assert b.gt_valid.dtype == bool
    assert np.asarray(b.gt_boxes).min() >= 0 and np.asarray(b.gt_boxes).max() <= 1


def test_eval_loader_pads_tail(toy_dir):
    ds = DetectionDataset(toy_dir)
    loader = DetectionLoader(ds, batch_size=10, train=False, source_size=64,
                             max_boxes=8, num_workers=2, prefetch=False)
    items = list(loader)
    assert len(items) == 3
    assert [it.count for it in items] == [10, 10, 4]
    assert items[-1].batch.images.shape[0] == 10


def test_loader_prefetch_matches_sync(toy_dir):
    ds = DetectionDataset(toy_dir)
    mk = lambda pf: DetectionLoader(ds, batch_size=8, train=False, source_size=64,
                                    max_boxes=8, num_workers=2, prefetch=pf)
    a = [np.asarray(it.batch.images) for it in mk(False)]
    b = [np.asarray(it.batch.images) for it in mk(True)]
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y)


def test_shuffle_changes_across_epochs(toy_dir):
    ds = DetectionDataset(toy_dir)
    loader = DetectionLoader(ds, batch_size=8, train=True, source_size=64,
                             max_boxes=8, num_workers=2, prefetch=False)
    e1 = [np.asarray(it.batch.gt_labels).tolist() for it in loader]
    e2 = [np.asarray(it.batch.gt_labels).tolist() for it in loader]
    assert e1 != e2  # fresh permutation per epoch
