"""SynthDrive generator (ssdx/data/synth.py): determinism, annotation
contract, and DetectionDataset/DetectionLoader integration."""
import numpy as np
import pytest

from ssdx.data.synth import CLASSES, generate_dataset, render_scene


def test_render_scene_contract():
    rng = np.random.default_rng(3)
    for _ in range(8):
        img, boxes, labels = render_scene(rng)
        assert img.shape == (512, 512, 3) and img.dtype == np.uint8
        assert boxes.shape == (len(labels), 4)
        if len(boxes):
            assert (boxes[:, 0] < boxes[:, 2]).all()
            assert (boxes[:, 1] < boxes[:, 3]).all()
            assert boxes.min() >= 0 and boxes.max() <= 512
            assert labels.min() >= 0 and labels.max() < len(CLASSES)


def test_render_scene_deterministic():
    a = render_scene(np.random.default_rng(11))
    b = render_scene(np.random.default_rng(11))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_generate_dataset_roundtrip(tmp_path):
    df = generate_dataset(tmp_path, 10, seed=5, empty_frac=0.3)
    # reference CSV schema (CarImageClass.py scan contract)
    assert list(df.columns) == [
        "filename", "width", "height", "class", "xmin", "ymin", "xmax", "ymax"
    ]
    assert (tmp_path / "annotations.csv").exists()
    n_jpg = len(list(tmp_path.glob("*.jpg")))
    assert n_jpg == 10

    from ssdx.data.dataset import DetectionDataset

    ds = DetectionDataset(tmp_path)
    assert len(ds) == 10
    # 'empty' is excluded from the class list; every class seen is canonical
    assert set(ds.classes) <= set(CLASSES)
    saw_empty = saw_boxes = False
    for i in range(len(ds)):
        img = ds.load_image(i)
        assert img.shape == (512, 512, 3)
        boxes, labels = ds.annotations(i)
        if len(boxes) == 0:
            saw_empty = True
        else:
            saw_boxes = True
            assert boxes[:, 2].max() <= 512 and boxes[:, 3].max() <= 512
    assert saw_boxes
    assert saw_empty  # empty_frac=0.3 over 10 images: P(none) < 3%


def test_loader_on_synth(tmp_path):
    """The real training loader consumes a generated dataset end to end."""
    generate_dataset(tmp_path, 8, seed=6)
    from ssdx.data.dataset import DetectionDataset
    from ssdx.data.pipeline import DetectionLoader

    ds = DetectionDataset(tmp_path)
    loader = DetectionLoader(ds, 4, train=True, source_size=512,
                             num_workers=2, seed=0)
    item = next(iter(loader))
    imgs = item.batch.images
    assert imgs.shape[0] == 4 and imgs.shape[-1] == 3
    assert np.isfinite(np.asarray(imgs)).all()
    # padded-GT contract: valid boxes are normalized and well-ordered
    valid = np.asarray(item.batch.gt_valid)
    boxes = np.asarray(item.batch.gt_boxes)
    assert valid.any()
    vb = boxes[valid]
    assert (vb[:, 2] > vb[:, 0]).all() and (vb[:, 3] > vb[:, 1]).all()
    assert vb.min() >= 0.0 and vb.max() <= 1.0 + 1e-6
