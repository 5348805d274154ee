"""Data-parallel (mesh-sharded) inference must be numerically identical to
single-device inference — the correctness half of the multi-chip inference
story (the v5e-8 throughput projection in README assumes sharded inference
is the same program replicated; this test proves it on the 8-virtual-device
CPU mesh from conftest.py).

Reference contract being preserved: ``mySSD.predict``
(/root/reference/SSD_from_scratch.py:338-476) is single-device; sharding is
an ssdx extension that must not change results.
"""
import numpy as np
import pytest

from ssdx.api import Detector
from ssdx.mesh import create_mesh

CLASSES = {"biker": 0, "car": 1, "pedestrian": 2, "trafficLight": 3, "truck": 4}


@pytest.fixture(scope="module")
def detectors():
    single = Detector(CLASSES, rng_seed=3)
    mesh = create_mesh()
    sharded = Detector(CLASSES, mesh=mesh, variables=single.variables)
    return single, sharded


def _images(b, seed=0):
    return np.random.default_rng(seed).normal(0, 1, (b, 300, 300, 3)).astype(
        np.float32
    )


def test_sharded_forward_matches_single_device(detectors):
    single, sharded = detectors
    imgs = _images(8)
    loc1, conf1 = single.forward(imgs)
    loc2, conf2 = sharded.forward(imgs)
    np.testing.assert_allclose(np.asarray(loc1), np.asarray(loc2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(conf1), np.asarray(conf2), atol=2e-4)


def test_sharded_predict_matches_single_device(detectors):
    single, sharded = detectors
    imgs = _images(8, seed=1)
    p1 = single.predict(imgs, score_thresh=0.1, nms_thresh=0.5)
    p2 = sharded.predict(imgs, score_thresh=0.1, nms_thresh=0.5)
    assert len(p1) == len(p2) == 8
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-4)
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-2)


def test_sharded_forward_pads_uneven_batch(detectors):
    single, sharded = detectors
    imgs = _images(6, seed=2)  # 6 % 8 != 0 -> zero-pad to 8, trim outputs
    loc1, conf1 = single.forward(imgs)
    loc2, conf2 = sharded.forward(imgs)
    assert loc2.shape == loc1.shape == (6, 8732, 4)
    np.testing.assert_allclose(np.asarray(loc1), np.asarray(loc2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(conf1), np.asarray(conf2), atol=2e-4)
