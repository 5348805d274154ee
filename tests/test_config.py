import dataclasses

import pytest

from ssdx.config import Config, DataConfig, TrainConfig


def test_defaults_match_reference_recipe():
    cfg = Config()
    assert cfg.data.batch_size == 16
    assert cfg.data.num_workers == 8
    assert cfg.train.epochs == 150
    assert cfg.train.warmup_epochs == 5
    assert cfg.train.base_lr == 3e-3
    assert cfg.train.min_lr == 1e-6
    assert cfg.train.weight_decay == 5e-3  # the actual run value, not fn default
    assert cfg.train.iou_thresh == 0.4
    assert cfg.eval.score_thresh == 0.2
    assert cfg.eval.nms_thresh == 0.3
    assert cfg.eval.max_per_img == 100
    assert cfg.data.seed == 724


def test_json_roundtrip(tmp_path):
    cfg = dataclasses.replace(
        Config(), train=dataclasses.replace(Config().train, epochs=7)
    )
    p = tmp_path / "cfg.json"
    cfg.to_json(p)
    loaded = Config.from_json(p)
    assert loaded.train.epochs == 7
    assert loaded == cfg


def test_partial_override(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text('{"train": {"epochs": 3}, "data": {"batch_size": 4}}')
    cfg = Config.from_json(p)
    assert cfg.train.epochs == 3
    assert cfg.data.batch_size == 4
    assert cfg.train.base_lr == 3e-3  # untouched defaults remain


def test_frozen():
    with pytest.raises(dataclasses.FrozenInstanceError):
        Config().train.epochs = 1
