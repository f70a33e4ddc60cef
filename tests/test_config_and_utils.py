"""Config persistence round-trip and profiling utilities."""

import time

from radnet_tpu.config import Config
from radnet_tpu.utils.profiling import Timer, stage_timer


def test_config_json_roundtrip(tmp_path):
    cfg = Config(network="vgg16", batch_size=4, anchor_box_scales=[32, 64])
    cfg.class_mapping = {"boat": 0, "bg": 1}
    path = str(tmp_path / "c.json")
    cfg.save(path)
    loaded = Config.load(path)
    assert loaded.network == "vgg16"
    assert loaded.batch_size == 4
    assert loaded.anchor_box_scales == [32, 64]
    assert loaded.class_mapping == {"boat": 0, "bg": 1}
    assert loaded.n_classes == 2 and loaded.bg_class_id == 1


def test_config_ignores_unknown_keys(tmp_path):
    # forward compatibility: configs written by newer versions load
    cfg = Config()
    d = cfg.to_dict()
    d["some_future_knob"] = 42
    import json

    path = tmp_path / "c.json"
    path.write_text(json.dumps(d))
    loaded = Config.load(str(path))
    assert loaded.network == cfg.network


def test_derived_properties():
    cfg = Config()
    assert cfg.n_anchors == 12  # 4 scales x 3 ratios
    assert cfg.feat_size == 38
    assert cfg.inv_class_mapping[0] == "boat"


def test_timer_accumulates():
    t = Timer()
    with t("a"):
        time.sleep(0.01)
    with t("a"):
        pass
    with t("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0.01
    assert "a" in t.report() and "b" in t.report()


def test_stage_timer_prints(capsys):
    with stage_timer("load", verbose=True):
        pass
    assert "load:" in capsys.readouterr().out
