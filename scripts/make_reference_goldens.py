"""Generate golden outputs from the ACTUAL reference implementation.

Runs the real ``mySSD`` (reference ``SSD_from_scratch.py``) on torch CPU with
deterministic transplanted weights (tests/ref_bridge.py) and records its
outputs into ``tests/goldens/reference_golden.npz``.  The always-on CI test
``tests/test_reference_golden.py`` then asserts ssdx reproduces these numbers
without needing torch or the reference checkout.

Covers (reference locations):
  * forward        loc/cls on random images      SSD_from_scratch.py:234-271
  * encode_ssd     matching + offset targets     :697-773
  * decode_ssd     offset -> cxcywh              :776-800
  * iou_nms        greedy DIoU keep order        :664-692
  * predict        full post-processing, both on synthetic head outputs and
                   end-to-end on the network's own forward outputs  :338-476

Usage:  python scripts/make_reference_goldens.py
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import ref_bridge  # noqa: E402

# The deployed app's class map (reference app_files/ssd_demo_app.py:26-28).
CLASS_TO_IDX = {"biker": 0, "car": 1, "pedestrian": 2, "trafficLight": 3, "truck": 4}
NUM_CLASSES = len(CLASS_TO_IDX) + 1
SEED = 724
IOU_THRESH = 0.4  # training-run matching threshold (SSD_model_train.ipynb cell 2)
NMS_THRESH = 0.3
SCORE_THRESH = 0.2


def ragged_to_arrays(dets: list[dict], prefix: str) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for b, d in enumerate(dets):
        out[f"{prefix}{b}_labels"] = d["labels"].numpy().astype(np.int64)
        out[f"{prefix}{b}_scores"] = d["scores"].numpy().astype(np.float32)
        out[f"{prefix}{b}_boxes"] = d["boxes"].numpy().astype(np.float32)
    return out


def compute_goldens() -> dict[str, np.ndarray]:
    import torch

    torch.manual_seed(0)
    arrays = ref_bridge.make_param_arrays(NUM_CLASSES, SEED)
    model = ref_bridge.torch_model_from_arrays(arrays, CLASS_TO_IDX)
    inputs = ref_bridge.make_test_inputs(NUM_CLASSES, SEED)
    golden: dict[str, np.ndarray] = {}

    # ---- forward ----
    with torch.no_grad():
        loc, cls = model(torch.from_numpy(inputs["images"]))
    golden["forward_loc"] = loc.numpy()
    golden["forward_cls"] = cls.numpy()
    print("forward:", loc.shape, cls.shape,
          "loc std %.3f cls std %.3f" % (loc.std(), cls.std()))

    # ---- encode_ssd ----
    loc_t, cls_t, pos, matched = model.encode_ssd(
        torch.from_numpy(inputs["gt_boxes"]),
        torch.from_numpy(inputs["gt_labels"]),
        iou_thresh=IOU_THRESH,
    )
    golden["encode_loc_t"] = loc_t.numpy()
    golden["encode_cls_t"] = cls_t.numpy().astype(np.int32)
    golden["encode_pos"] = pos.numpy()
    print("encode: positives", int(pos.sum()))

    # ---- decode_ssd ----
    pri = model.priors[: inputs["dec_loc"].shape[0]]
    dec = model.decode_ssd(torch.from_numpy(inputs["dec_loc"]), pri, (0.1, 0.2))
    golden["decode_out"] = dec.numpy()

    # ---- iou_nms ----
    keep = model.iou_nms(
        torch.from_numpy(inputs["nms_boxes"]),
        torch.from_numpy(inputs["nms_scores"]),
        iou_threshold=0.45,
    )
    golden["nms_keep"] = keep.numpy().astype(np.int64)
    print("nms: kept", len(keep), "of", len(inputs["nms_boxes"]))

    # ---- predict on synthetic head outputs ----
    dummy = torch.zeros(2, 3, 300, 300)
    dets = model.predict(
        dummy,
        score_thresh=SCORE_THRESH,
        nms_thresh=NMS_THRESH,
        max_per_img=100,
        pre_loc_all=torch.from_numpy(inputs["pred_loc"]),
        pre_conf_all=torch.from_numpy(inputs["pred_conf"]),
    )
    golden.update(ragged_to_arrays(dets, "predict_syn_"))
    print("predict synthetic:", [len(d["labels"]) for d in dets])

    # ---- predict end-to-end on the network's own outputs ----
    # Pick a threshold that keeps ~600 (prior, class) pairs per image so the
    # reference's unbounded survivor set stays comparable to ssdx's capped
    # top-k selection (caps pinned wide in the test).
    scores_all = torch.softmax(cls, dim=-1)[..., 1:]
    thr = float(np.quantile(scores_all.numpy(), 1.0 - 600.0 / scores_all[0].numel()))
    golden["predict_e2e_thresh"] = np.float32(thr)
    dets = model.predict(
        dummy,
        score_thresh=thr,
        nms_thresh=NMS_THRESH,
        max_per_img=100,
        pre_loc_all=loc,
        pre_conf_all=cls,
    )
    golden.update(ragged_to_arrays(dets, "predict_e2e_"))
    print("predict e2e: thresh %.5f," % thr, [len(d["labels"]) for d in dets])
    return golden


def main() -> None:
    golden = compute_goldens()
    out = Path(__file__).resolve().parents[1] / "tests" / "goldens"
    out.mkdir(parents=True, exist_ok=True)
    path = out / "reference_golden.npz"
    np.savez_compressed(path, **golden)
    print("wrote", path, f"({path.stat().st_size/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
