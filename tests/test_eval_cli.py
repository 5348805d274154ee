"""Eval CLI: weights export -> evaluate_weights -> mAP dict."""
import numpy as np
import pandas as pd
import pytest
import jax


@pytest.fixture(scope="module")
def eval_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("eval_cli")
    rng = np.random.default_rng(5)
    rows = []
    for i in range(16):
        name = f"v{i:02d}.jpg"
        cv2.imwrite(str(d / name), rng.integers(0, 255, (64, 64, 3), np.uint8))
        rows.append(dict(filename=name, width=64, height=64,
                         **{"class": "car" if i % 2 else "truck"},
                         xmin=8, ymin=8, xmax=40, ymax=40))
    pd.DataFrame(rows).to_csv(d / "ann.csv", index=False)
    return d


def test_evaluate_weights_end_to_end(eval_dir, tmp_path):
    from ssdx.model import SSD300
    from ssdx.train.checkpoint import save_params
    from ssdx.eval.run import evaluate_weights

    model = SSD300(num_classes=3, width_mult=0.25)
    variables = model.init_variables(jax.random.key(0))
    w = save_params(variables["params"], variables["batch_stats"],
                    tmp_path / "m.weights")

    out = evaluate_weights(
        w, eval_dir, batch_size=8, bfloat16=False, num_workers=2,
        source_size=64, max_boxes=4, width_mult=0.25,
    )
    assert np.isfinite(out["testing loss"])
    m = out["mAP"]
    assert "map_50" in m and "map_per_class" in m
    assert out["classes"] == ["car", "truck"]
    assert -1.0 <= m["map_50"] <= 1.0
