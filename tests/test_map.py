import numpy as np

from ssdx.eval.map import MeanAP


def _box(x, y, w=10, h=10):
    return [x, y, x + w, y + h]


def test_perfect_predictions_map_one():
    m = MeanAP()
    gt = [{"boxes": np.array([_box(0, 0), _box(50, 50)]), "labels": np.array([0, 1])}]
    pred = [{"boxes": np.array([_box(0, 0), _box(50, 50)]),
             "scores": np.array([0.9, 0.8]), "labels": np.array([0, 1])}]
    m.update(pred, gt)
    out = m.compute()
    assert np.isclose(out["map_50"], 1.0)
    np.testing.assert_allclose(out["map_per_class"], [1.0, 1.0])


def test_no_predictions_map_zero():
    m = MeanAP()
    gt = [{"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}]
    pred = [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0, int)}]
    m.update(pred, gt)
    assert m.compute()["map_50"] == 0.0


def test_wrong_class_is_fp():
    m = MeanAP()
    gt = [{"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}]
    pred = [{"boxes": np.array([_box(0, 0)]), "scores": np.array([0.9]),
             "labels": np.array([1])}]
    m.update(pred, gt)
    out = m.compute()
    # class 0: no detection -> AP 0.  class 1: no GT -> excluded (-1).
    assert out["map_50"] == 0.0
    assert out["map_per_class"].tolist() == [0.0, -1.0]


def test_half_precision_case():
    # 1 GT, 2 detections (1 TP @higher score, 1 FP): PR = (1.0@r=1 after tp first)
    m = MeanAP()
    gt = [{"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}]
    pred = [{"boxes": np.array([_box(0, 0), _box(200, 200)]),
             "scores": np.array([0.9, 0.8]), "labels": np.array([0, 0])}]
    m.update(pred, gt)
    # TP first: precision at recall 1.0 is 1.0 -> AP = 1.0 (envelope)
    assert np.isclose(m.compute()["map_50"], 1.0)

    m.reset()
    pred = [{"boxes": np.array([_box(200, 200), _box(0, 0)]),
             "scores": np.array([0.9, 0.8]), "labels": np.array([0, 0])}]
    m.update(pred, gt)
    # FP first: precision at recall 1.0 is 0.5 -> AP = 0.5
    assert np.isclose(m.compute()["map_50"], 0.5)


def test_double_detection_second_is_fp():
    m = MeanAP()
    gt = [{"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}]
    pred = [{"boxes": np.array([_box(0, 0), _box(1, 1)]),
             "scores": np.array([0.9, 0.8]), "labels": np.array([0, 0])}]
    m.update(pred, gt)
    out = m.compute()
    assert np.isclose(out["map_50"], 1.0)  # recall hit at rank 1; envelope keeps 1.0


def test_iou_below_threshold_is_fp():
    m = MeanAP()
    gt = [{"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}]
    pred = [{"boxes": np.array([_box(8, 8)]), "scores": np.array([0.9]),
             "labels": np.array([0])}]  # IoU = 4/196 << 0.5
    m.update(pred, gt)
    assert m.compute()["map_50"] == 0.0


def test_torchmetrics_key_set_and_mar():
    m = MeanAP()
    gt = [{"boxes": np.array([_box(0, 0), _box(50, 50)]), "labels": np.array([0, 0])}]
    pred = [{"boxes": np.array([_box(0, 0)]), "scores": np.array([0.9]),
             "labels": np.array([0])}]
    m.update(pred, gt)
    out = m.compute()
    for k in ["map", "map_50", "map_75", "map_small", "map_medium",
              "map_large", "mar_100", "map_per_class", "classes"]:
        assert k in out
    assert out["map"] == out["map_50"]
    assert out["map_75"] == -1.0
    # one of two GTs recalled
    assert np.isclose(out["mar_100"], 0.5)


def test_multi_image_accumulation():
    m = MeanAP()
    for i in range(4):
        gt = [{"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}]
        ok = i < 2  # half the images predicted correctly
        px = 0 if ok else 100
        pred = [{"boxes": np.array([_box(px, px)]), "scores": np.array([0.9 - i * 0.1]),
                 "labels": np.array([0])}]
        m.update(pred, gt)
    out = m.compute()
    # 2 TPs then 2 FPs in score order; recall tops at 0.5 with precision 1.0
    # -> 101-pt AP ≈ mean of 1.0 on [0,0.5] grid points and 0 beyond
    assert 0.49 < out["map_50"] < 0.52


# ---- extended torchmetrics dict: area splits + mar_1/mar_10 (VERDICT r1 #5) ----

def test_area_split_ap_hand_computed():
    m = MeanAP()
    # one small GT (10x10 = 100 px^2) + one large GT (150x150 = 22500 px^2)
    gt = [{"boxes": np.array([_box(0, 0), _box(50, 50, 150, 150)]),
           "labels": np.array([0, 0])}]
    pred = [{"boxes": np.array([_box(0, 0), _box(50, 50, 150, 150)]),
             "scores": np.array([0.9, 0.8]), "labels": np.array([0, 0])}]
    m.update(pred, gt)
    out = m.compute()
    # small range: large GT ignored, large det matched-to-ignored -> dropped;
    # the remaining small TP gives AP 1.0 over n_gt=1.  Same for large.
    assert np.isclose(out["map_small"], 1.0)
    assert np.isclose(out["map_large"], 1.0)
    assert out["map_medium"] == -1.0  # no GT in [32^2, 96^2]
    assert np.isclose(out["mar_small"], 1.0)
    assert np.isclose(out["mar_large"], 1.0)
    assert out["mar_medium"] == -1.0
    assert np.isclose(out["map_50"], 1.0)


def test_area_split_out_of_range_fp_is_ignored():
    m = MeanAP()
    gt = [{"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}]  # small GT
    # higher-scored unmatched LARGE det + the small TP
    pred = [{"boxes": np.array([_box(50, 50, 150, 150), _box(0, 0)]),
             "scores": np.array([0.95, 0.9]), "labels": np.array([0, 0])}]
    m.update(pred, gt)
    out = m.compute()
    # all-area: FP first then TP -> precision 0.5 at recall 1 -> AP 0.5
    assert np.isclose(out["map_50"], 0.5)
    # small range: the unmatched large det is out of range -> dropped -> AP 1.0
    assert np.isclose(out["map_small"], 1.0)


def test_mar_1_and_mar_10_hand_computed():
    m = MeanAP()
    # image 1: 2 GTs, 2 TPs (scores 0.9, 0.8)
    m.update(
        [{"boxes": np.array([_box(0, 0), _box(50, 50)]),
          "scores": np.array([0.9, 0.8]), "labels": np.array([0, 0])}],
        [{"boxes": np.array([_box(0, 0), _box(50, 50)]),
          "labels": np.array([0, 0])}],
    )
    # image 2: 1 GT; highest-scored det is an FP, second is the TP
    m.update(
        [{"boxes": np.array([_box(200, 200), _box(0, 0)]),
          "scores": np.array([0.9, 0.8]), "labels": np.array([0, 0])}],
        [{"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}],
    )
    out = m.compute()
    # top-1 per image: img1 -> 1 TP, img2 -> 0 TP; n_gt = 3
    assert np.isclose(out["mar_1"], 1.0 / 3.0)
    # top-10: all TPs found
    assert np.isclose(out["mar_10"], 1.0)
    assert np.isclose(out["mar_100"], 1.0)
