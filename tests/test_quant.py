"""Int8 post-training quantization (ssdx/quant.py).

Validates the quantized serving path end to end on CPU: arithmetic
plumbing (int8 pools, exact-integer convs), forward agreement with the
bf16 path on the bundled trained demo weights, and detection-level
agreement through the full predict pipeline.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssdx import quant
from ssdx.api import Detector
from ssdx.serve.app import CLASS_TO_IDX


def test_int8_max_pool_matches_float():
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 128, (2, 10, 10, 8)).astype(np.int8))
    got = quant._max_pool(x8, ceil=False)
    want = quant._max_pool(x8.astype(jnp.float32), ceil=False)
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # ceil mode: odd extent rounds up, edge pad is the identity
    x8 = jnp.asarray(rng.integers(-127, 128, (1, 5, 5, 8)).astype(np.int8))
    got = quant._max_pool(x8, ceil=True)
    want = quant._max_pool(x8.astype(jnp.float32), ceil=True)
    assert got.shape == (1, 3, 3, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _demo_detector():
    from pathlib import Path

    import ssdx.serve.app as app_mod

    bundled = Path(app_mod.__file__).parent / "demo_weights.npz"
    return Detector.from_weights(bundled, CLASS_TO_IDX, fold_bn=True)


@pytest.fixture()
def demo_detector():
    # function-scoped: quantize_int8 mutates the detector's forward in place
    return _demo_detector()


@pytest.fixture(scope="module")
def example_images():
    """Normalized [N,300,300,3] batch from the bundled example scenes."""
    from pathlib import Path

    from PIL import Image

    import ssdx.serve.app as app_mod

    static = Path(app_mod.__file__).parent / "static"
    det = Detector(CLASS_TO_IDX)  # preprocess only
    imgs = [
        det.preprocess_pil(Image.open(static / f"example_{i}.jpg"))[0]
        for i in (1, 2, 3)
    ]
    return np.stack(imgs)


def test_quantize_ssd_structure(demo_detector):
    params = demo_detector.variables["params"]
    feats = quant.stem_bf16(params, jnp.zeros((1, 300, 300, 3)))
    scales = quant.calibrate_act_scales(params, feats)
    assert set(scales) == {spec.name for spec in quant._TOPOLOGY}
    qp = quant.quantize_ssd(params, scales, demo_detector.num_classes)
    for name, ql in qp.layers.items():
        assert ql.kernel_q.dtype == jnp.int8
        cout = params[name]["Conv_0"]["kernel"].shape[-1]
        assert ql.w_scale.shape == (cout,)
        # per-channel scaling uses the full int8 range on the max channel
        assert int(jnp.max(jnp.abs(ql.kernel_q))) == 127


def test_f32_compute_route_matches_int32():
    """apply_int8's CPU fast route (f32-cast conv + round) must reproduce
    the exact int8 x int8 -> int32 contraction.  Checked directly at the
    worst-accumulation layer shape (conv6: 9*512 products of magnitude
    127^2) with full-range random operands — running the whole topology
    through the scalar int32 CPU path takes minutes, and the layer-level
    integer identity is the entire difference between the routes."""
    rng = np.random.default_rng(7)
    xq = jnp.asarray(rng.integers(-127, 128, (1, 19, 19, 512)).astype(np.int8))
    kq = jnp.asarray(rng.integers(-127, 128, (3, 3, 512, 64)).astype(np.int8))
    spec = quant._L("probe", (3, 3), 1, ((6, 6), (6, 6)), 6, None, None)
    want = quant._conv(xq, kq, spec, jnp.int32)
    got = jnp.round(
        quant._conv(xq.astype(jnp.float32), kq.astype(jnp.float32), spec,
                    jnp.float32)
    ).astype(jnp.int32)
    diff = np.abs(np.asarray(want, np.int64) - np.asarray(got, np.int64))
    # exact in measurement; allow one int32 step for accumulation-order luck
    assert diff.max() <= 1, diff.max()


@pytest.fixture(scope="module")
def quant_outputs(example_images):
    """Everything both slow tests need, computed with exactly ONE bf16 and
    ONE int8 full-width forward, shared between the raw-logit and
    detection-level assertions via
    ``predict_batched(pre_loc_all=..., pre_conf_all=...)``.  The int8
    forward runs apply_int8's CPU f32 fast route (compute="auto"), which
    test_f32_compute_route_matches_int32 pins to the integer semantics —
    the scalar int32 CPU path took ~8 min for these three images."""
    det = _demo_detector()
    loc_a, cls_a = det.forward(example_images)
    det_bf = det.predict_batched(
        pre_loc_all=loc_a, pre_conf_all=cls_a, score_thresh=0.5)
    det.quantize_int8(example_images)
    loc_b, cls_b = det.forward(example_images)
    det_i8 = det.predict_batched(
        pre_loc_all=loc_b, pre_conf_all=cls_b, score_thresh=0.3)
    return dict(loc_a=loc_a, cls_a=cls_a, loc_b=loc_b, cls_b=cls_b,
                det_bf=det_bf, det_i8=det_i8)


def test_int8_forward_close_to_bf16(quant_outputs):
    """Raw head outputs of the int8 backbone track the bf16 ones on real
    (trained-weight, in-distribution) inputs."""
    loc_a, cls_a = quant_outputs["loc_a"], quant_outputs["cls_a"]
    loc_b, cls_b = quant_outputs["loc_b"], quant_outputs["cls_b"]

    # class logits drive detection: require tight correlation and bounded
    # error relative to the logit spread
    for a, b in ((cls_a, cls_b), (loc_a, loc_b)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        rel_rmse = np.sqrt(np.mean((a - b) ** 2)) / (np.std(a) + 1e-9)
        assert corr > 0.99, corr
        assert rel_rmse < 0.12, rel_rmse


def test_int8_detection_agreement(quant_outputs, example_images):
    """Through the full predict pipeline, int8 finds every object bf16 is
    confident about on the bundled example scenes.

    Hysteresis matching: the bf16 side is filtered to score >= 0.5 and the
    int8 side runs at score_thresh = 0.3, so small quantization-induced
    score shifts around a single threshold can't flip borderline detections
    in or out of the comparison (the failure mode of a knife-edge
    equal-threshold match on a handful of detections)."""
    from ssdx.boxes import pairwise_iou

    det_bf = quant_outputs["det_bf"]
    det_i8 = quant_outputs["det_i8"]

    assert int(np.asarray(det_bf.valid).sum()) > 0  # scenes have objects
    n_conf = n_found = 0
    ious = []
    for b in range(example_images.shape[0]):
        va = np.asarray(det_bf.valid[b])
        vb = np.asarray(det_i8.valid[b])
        ba = np.asarray(det_bf.boxes[b])[va]
        la = np.asarray(det_bf.labels[b])[va]
        bb = np.asarray(det_i8.boxes[b])[vb]
        lb = np.asarray(det_i8.labels[b])[vb]
        n_conf += len(ba)
        if len(ba) == 0 or len(bb) == 0:
            continue
        iou = np.asarray(pairwise_iou(jnp.asarray(ba), jnp.asarray(bb)))
        for i in range(len(ba)):
            j = int(np.argmax(iou[i]))
            if iou[i, j] >= 0.5 and la[i] == lb[j]:
                n_found += 1
                ious.append(float(iou[i, j]))
    assert n_conf > 0
    assert n_found / n_conf >= 0.9, (n_found, n_conf)
    assert float(np.mean(ious)) >= 0.85, np.mean(ious)
