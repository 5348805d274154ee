import numpy as np
import pandas as pd
import pytest

from ssdx.data.preprocess import (
    add_empty_rows,
    collapse_traffic_lights,
    preprocess,
    split_dataframe,
)


@pytest.fixture()
def export_dir(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    rows = []
    classes = ["car", "trafficLight-Red", "trafficLight-GreenLeft", "pedestrian"]
    for i in range(30):
        name = f"f{i:03d}.jpg"
        cv2.imwrite(str(tmp_path / name),
                    rng.integers(0, 255, (32, 32, 3), np.uint8))
        if i < 24:  # last 6 images left unannotated
            rows.append(dict(filename=name, width=512, height=512,
                             **{"class": classes[i % 4]},
                             xmin=1, ymin=1, xmax=20, ymax=20))
    pd.DataFrame(rows).to_csv(tmp_path / "_annotations.csv", index=False)
    return tmp_path


def test_collapse_traffic_lights():
    df = pd.DataFrame({"class": ["trafficLight-Red", "trafficLightGreen", "car"]})
    out = collapse_traffic_lights(df)
    assert out["class"].tolist() == ["trafficLight", "trafficLight", "car"]


def test_add_empty_rows(export_dir):
    df = pd.read_csv(export_dir / "_annotations.csv")
    out = add_empty_rows(df, export_dir)
    empties = out[out["class"] == "empty"]
    assert len(empties) == 6
    assert (empties[["xmin", "ymin", "xmax", "ymax"]].to_numpy() == 0).all()
    assert (empties["width"] == 512).all()


def test_split_no_group_leak(export_dir):
    df = add_empty_rows(
        collapse_traffic_lights(pd.read_csv(export_dir / "_annotations.csv")),
        export_dir,
    )
    tr, te = split_dataframe(df, n_splits=3, seed=724)
    assert not (set(tr["filename"]) & set(te["filename"]))
    assert len(tr) + len(te) == len(df)


def test_full_preprocess(export_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("clean")
    train_dir, test_dir = preprocess(export_dir, out)
    tr = pd.read_csv(train_dir / "train_annotate.csv")
    te = pd.read_csv(test_dir / "test_annotate.csv")
    # traffic lights collapsed everywhere
    assert not tr["class"].str.startswith("trafficLight-").any()
    # images copied
    for name in tr["filename"].unique():
        assert (train_dir / name).exists()
    for name in te["filename"].unique():
        assert (test_dir / name).exists()
    # determinism
    out2 = tmp_path_factory.mktemp("clean2")
    train2, _ = preprocess(export_dir, out2)
    tr2 = pd.read_csv(train2 / "train_annotate.csv")
    assert tr["filename"].tolist() == tr2["filename"].tolist()
