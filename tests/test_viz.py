import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest
from PIL import Image

from ssdx.viz import plot_losses, show_with_box, side_by_side_prediction


def _losses(n=3):
    return {
        "train_loss": [3.0 - i for i in range(n)],
        "train_loss_loc": [1.0] * n,
        "train_loss_conf": [2.0 - i for i in range(n)],
        "test_loss": [3.5 - i for i in range(n)],
        "test_loss_loc": [1.2] * n,
        "test_loss_conf": [2.3 - i for i in range(n)],
        "mAP": [{"map_50": 0.1 * (i + 1)} for i in range(n)],
    }


def test_plot_losses_ok():
    fig = plot_losses(_losses())
    assert len(fig.axes) == 4


def test_plot_losses_validation():
    bad = _losses()
    del bad["mAP"]
    with pytest.raises(KeyError):
        plot_losses(bad)
    bad = _losses()
    bad["train_loss"][0] = float("nan")
    with pytest.raises(ValueError):
        plot_losses(bad)
    bad = _losses()
    bad["test_loss"] = bad["test_loss"][:-1]
    with pytest.raises(ValueError):
        plot_losses(bad)
    bad = _losses()
    bad["train_loss"] = "oops"
    with pytest.raises(TypeError):
        plot_losses(bad)


def test_show_with_box_modes():
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    target = {"boxes": np.array([[5, 5, 30, 30]], np.float32),
              "labels": np.array([0])}
    pred = {"boxes": np.array([[0.1, 0.1, 0.5, 0.5]], np.float32),
            "labels": np.array([1])}
    for ref in ("normalized", "current", "size"):
        fig = show_with_box(img, target, class_to_idx={"car": 0, "truck": 1},
                            label=True, pred_dict=pred, pred_label=True,
                            pred_ref=ref)
        assert fig is not None
    with pytest.raises(ValueError):
        show_with_box(img, target, pred_dict=pred, pred_ref="bogus")
    with pytest.raises(ValueError):
        show_with_box(img, target, pred_dict=pred, pred_ref="size", pred_size=(0, 0))


def test_show_with_box_chw_float_input():
    img = np.random.default_rng(1).uniform(0, 1, (3, 48, 48)).astype(np.float32)
    fig = show_with_box(img, {"boxes": np.zeros((0, 4)), "labels": np.zeros(0)})
    assert fig is not None


class _StubDetector:
    idx_to_class = {0: "car"}

    def predict_pil(self, pil_img, **kw):
        return {"labels": np.array([0]), "scores": np.array([0.8]),
                "boxes": np.array([[10, 10, 100, 100]], np.float32)}


def test_side_by_side_geometry():
    img = Image.new("RGB", (640, 480), (10, 20, 30))
    out = side_by_side_prediction(_StubDetector(), pil_img=img, target_height=256)
    assert out.height == 256
    assert out.width == 2 * round(256 * 640 / 480)
    with pytest.raises(TypeError):
        side_by_side_prediction(_StubDetector())
    with pytest.raises(TypeError):
        side_by_side_prediction(_StubDetector(), image_path="x.jpg", pil_img=img)
