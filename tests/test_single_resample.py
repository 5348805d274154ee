"""Eval preprocessing fidelity: the loader must resample ONCE from native
resolution (the reference resizes the original image once, antialiased, to
300x300 — SSD_from_scratch.py:554-560; SURVEY §7 hard-parts #6 flags a
double resample as a mAP-parity risk).

source_size=None (the default) auto-resolves to the dataset's uniform square
native resolution so the only resample is the antialiased device resize
native -> 300; these tests pin that behavior and quantify the pixel delta
the old 512-intermediate path introduced.
"""
import numpy as np
import pandas as pd
import pytest

from ssdx.data.dataset import DetectionDataset
from ssdx.data.pipeline import DetectionLoader

NATIVE = 96


@pytest.fixture(scope="module")
def native_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("native96")
    rng = np.random.default_rng(3)
    rows = []
    for i in range(4):
        # high-frequency content makes resample differences visible
        img = (rng.integers(0, 2, (NATIVE, NATIVE, 3)) * 255).astype(np.uint8)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(d / name), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        rows.append(dict(filename=name, width=NATIVE, height=NATIVE,
                         **{"class": "car"}, xmin=8, ymin=8, xmax=48, ymax=64))
    pd.DataFrame(rows).to_csv(d / "ann.csv", index=False)
    return d


def test_native_size_from_csv(native_dir):
    assert DetectionDataset(native_dir).native_size() == (NATIVE, NATIVE)


def test_native_size_fallback_decodes_images(native_dir, tmp_path):
    # CSV without width/height columns -> decode-sample fallback
    import shutil

    d = tmp_path / "nosize"
    shutil.copytree(native_dir, d)
    df = pd.read_csv(d / "ann.csv").drop(columns=["width", "height"])
    df.to_csv(d / "ann.csv", index=False)
    assert DetectionDataset(d).native_size() == (NATIVE, NATIVE)


def test_loader_defaults_to_native_single_resample(native_dir):
    ds = DetectionDataset(native_dir)
    loader = DetectionLoader(ds, batch_size=4, train=False, num_workers=2,
                             prefetch=False)
    assert loader.source_size == NATIVE  # no host intermediate resize
    lb = next(iter(loader))
    assert lb.batch.images.shape == (4, 300, 300, 3)
    # boxes normalized against the native size
    np.testing.assert_allclose(
        np.asarray(lb.batch.gt_boxes[0, 0]),
        np.array([8, 8, 48, 64]) / NATIVE, atol=1e-6)


def test_double_resample_pixel_delta_is_real_and_bounded(native_dir):
    """Quantify what the old 512-intermediate path did to eval pixels: the
    two paths must agree coarsely (same image) but differ measurably on
    high-frequency content — the reason the faithful path is the default."""
    ds = DetectionDataset(native_dir)
    single = next(iter(DetectionLoader(
        ds, batch_size=4, train=False, num_workers=2, prefetch=False)))
    double = next(iter(DetectionLoader(
        ds, batch_size=4, train=False, num_workers=2, prefetch=False,
        source_size=512)))
    a = np.asarray(single.batch.images)
    b = np.asarray(double.batch.images)
    mad = float(np.abs(a - b).mean())
    assert 1e-4 < mad < 0.5, mad  # differs (double resample is lossy), same image
    # box geometry is scale-linear: identical through either path
    np.testing.assert_allclose(np.asarray(single.batch.gt_boxes),
                               np.asarray(double.batch.gt_boxes), atol=1e-6)
