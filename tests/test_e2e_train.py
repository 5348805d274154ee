"""End-to-end integration: real loaders + fit() + checkpoint/resume on a tiny
on-disk dataset (the reference's tiny-train smoke, SURVEY §4)."""
import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from ssdx import priors as P
from ssdx.data.dataset import DetectionDataset
from ssdx.data.pipeline import DetectionLoader
from ssdx.mesh import create_mesh
from ssdx.model import SSD300
from ssdx.train.checkpoint import load_checkpoint
from ssdx.train.loop import fit, merge_results
from ssdx.train.schedule import build_optimizer
from ssdx.train.step import create_train_state, make_eval_step, make_train_step

PRI = P.create_priors()
PRIORS = jnp.asarray(PRI)
PRIORS_XYXY = jnp.asarray(P.priors_xyxy(PRI))


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("tiny")
    rng = np.random.default_rng(1)
    rows = []
    for i in range(16):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        name = f"t{i:02d}.jpg"
        cv2.imwrite(str(d / name), img)
        rows.append(dict(filename=name, width=64, height=64,
                         **{"class": "car" if i % 2 else "truck"},
                         xmin=8, ymin=8, xmax=40, ymax=40))
    pd.DataFrame(rows).to_csv(d / "ann.csv", index=False)
    return d


def _build(tiny_dir, save_dir, epochs=2):
    ds = DetectionDataset(tiny_dir)
    mesh = create_mesh()
    model = SSD300(num_classes=len(ds.classes) + 1, width_mult=0.25)
    tx, _ = build_optimizer(steps_per_epoch=2, max_epochs=epochs,
                            warmup_epochs=0, base_lr=1e-3)
    state = create_train_state(model, tx, jax.random.key(0))
    train_step = make_train_step(model, tx, PRIORS, PRIORS_XYXY,
                                 iou_thresh=0.4, mesh=mesh)
    eval_step = make_eval_step(model, PRIORS, PRIORS_XYXY, iou_thresh=0.4,
                               score_thresh=0.2, nms_thresh=0.3,
                               max_per_img=10, mesh=mesh)
    mk_train = lambda: DetectionLoader(ds, 8, train=True, source_size=64,
                                       max_boxes=4, num_workers=2, mesh=mesh)
    mk_val = lambda: DetectionLoader(ds, 8, train=False, source_size=64,
                                     max_boxes=4, num_workers=2, mesh=mesh)
    return ds, model, tx, state, train_step, eval_step, mk_train, mk_val


def test_fit_checkpoint_resume(tiny_dir, tmp_path):
    save_dir = tmp_path / "ckpts"
    (ds, model, tx, state, train_step, eval_step, mk_train, mk_val) = _build(
        tiny_dir, save_dir)

    logs = []
    state, results = fit(
        train_step, eval_step, state,
        train_loader_fn=mk_train, val_loader_fn=mk_val,
        epochs=2, save_model=True, save_dir=save_dir, timing=True,
        rng_key=jax.random.key(0), log=logs.append,
    )

    # results-dict contract (reference SSD_trainer.py:351-360)
    for k in ["train_loss", "train_loss_loc", "train_loss_conf", "test_loss",
              "test_loss_loc", "test_loss_conf", "mAP", "epochs",
              "training timing", "testing timing"]:
        assert k in results
    assert len(results["train_loss"]) == 2
    assert results["epochs"] == [2]
    assert all(np.isfinite(results["train_loss"]))
    assert 0.0 <= results["mAP"][0]["map_50"] <= 1.0 or results["mAP"][0]["map_50"] == -1.0
    assert len(logs) == 2 and "mAP" in logs[0]
    assert (save_dir / "last.ckpt").exists()

    # ---- resume: start from the checkpoint, train 1 more epoch ----
    (_, _, _, fresh, train_step2, eval_step2, mk_train2, mk_val2) = _build(
        tiny_dir, save_dir)
    restored, start_epoch, _best, loss_dict, _ = load_checkpoint(
        save_dir / "last.ckpt", fresh)
    assert start_epoch == 2  # 2 epochs completed -> next epoch index 2
    assert len(loss_dict["train_loss"]) == 2
    state2, results2 = fit(
        train_step2, eval_step2, restored,
        train_loader_fn=mk_train2, val_loader_fn=mk_val2,
        epochs=1, save_model=False, past_train_dict=loss_dict,
        log=lambda s: None,
    )
    assert len(results2["train_loss"]) == 3  # merged 2 + 1
    assert results2["epochs"] == [1 + loss_dict["epochs"][0]]


def test_merge_results_contract():
    d1 = {"a": [1, 2], "epochs": [2]}
    d2 = {"a": [3], "epochs": [5]}
    out = merge_results(d1, d2)
    assert out["a"] == [1, 2, 3]
    assert out["epochs"] == [5]
    with pytest.raises(KeyError):
        merge_results({"a": [1]}, {"b": [2]})


def test_merge_results_recursive_and_sets():
    """Nested dicts merge recursively and sets concatenate without dups —
    no silent ((a,b),c) tuple nesting after repeated resumes."""
    d1 = {"meta": {"hist": [1], "note": "x"}, "tags": {"a", "b"}, "epochs": [1]}
    d2 = {"meta": {"hist": [2], "note": "y"}, "tags": {"b", "c"}, "epochs": [2]}
    out = merge_results(d1, d2)
    assert out["meta"]["hist"] == [1, 2]
    assert out["meta"]["note"] == ("x", "y")  # scalar leaves keep both
    assert sorted(out["tags"]) == ["a", "b", "c"]
    # a second resume must not nest structured values
    d3 = {"meta": {"hist": [3], "note": "z"}, "tags": {"d"}, "epochs": [3]}
    out2 = merge_results({**out, "meta": {"hist": out["meta"]["hist"],
                                          "note": "y"}}, d3)
    assert out2["meta"]["hist"] == [1, 2, 3]
    # partial-key nested dicts fall back to d2-wins shallow merge
    out3 = merge_results({"m": {"a": 1}, "epochs": [0]},
                         {"m": {"a": 2, "b": 3}, "epochs": [1]})
    assert out3["m"] == {"a": 2, "b": 3}
