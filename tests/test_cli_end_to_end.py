"""End-to-end CLI slice: train -> cont_train -> load_radnet -> predict.

The synthetic-dataset equivalent of the reference's manual workflow
(README.md:23-44 of the reference): short joint RPN+detector training on a
tiny on-disk dataset through the real ``train.py`` driver, resume via
``cont_train.py``, then inference through the saved model directory.
"""

import json
import os

import numpy as np
import pytest

from tests.util import tiny_config


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import cv2
    import pandas as pd

    tmp = tmp_path_factory.mktemp("cli")
    cfg = tiny_config("vgg16")
    cfg.tile_size = 100
    cfg.tile_overlap = 50
    cfg.use_noise = False
    cfg.use_rotations = False
    cfg.use_shear = False

    rng = np.random.default_rng(0)
    img_type = cfg.img_types[0]
    for split in ("train", "val"):
        rows = []
        for i in range(3):
            img = np.zeros((100, 100, 3), np.uint8)
            x1, y1 = rng.integers(5, 30, 2)
            w, h = rng.integers(30, 50, 2)
            img[y1 : y1 + h, x1 : x1 + w] = int(rng.integers(90, 200))
            name = f"{split}_{i}.png"
            d = tmp / "data" / img_type / split
            d.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(d / name), img)
            rows.append(
                {
                    "img_path": name,
                    "label": "boat" if i % 2 == 0 else "human",
                    "xmin": x1,
                    "ymin": y1,
                    "xmax": x1 + w,
                    "ymax": y1 + h,
                }
            )
        pd.DataFrame(rows).to_csv(tmp / f"{split}.csv", index=False)

    cfg_path = tmp / "tiny_config.json"
    cfg.save(str(cfg_path))
    return tmp, cfg


def test_train_cont_and_predict(workspace, monkeypatch):
    tmp, cfg = workspace
    monkeypatch.chdir(tmp)

    from radnet_tpu.cli.train import main as train_main

    rc = train_main(
        [
            "--config-json", "tiny_config.json",
            "--model-name", "smoke",
            "--train-annot", "train.csv",
            "--train-data", "data/train",
            "--val-annot", "val.csv",
            "--val-data", "data/val",
            "--epoch-length", "2",
            "--n-epochs", "1",
        ]
    )
    assert rc == 0
    model_dir = os.path.join("models", "faster_rcnn_vgg16_smoke")
    assert os.path.exists(os.path.join(model_dir, "record.csv"))
    assert os.path.exists(os.path.join(model_dir, "config.json"))
    assert os.path.isdir(os.path.join(model_dir, "ckpt_last"))

    from radnet_tpu.cli.cont_train import main as cont_main

    rc = cont_main(
        [
            "--model-name", "faster_rcnn_vgg16_smoke",
            "--train-annot", "train.csv",
            "--train-data", "data/train",
            "--epoch-length", "2",
            "--n-epochs", "1",
            "--no-validation",
        ]
    )
    assert rc == 0
    import pandas as pd

    rec = pd.read_csv(os.path.join(model_dir, "record.csv"))
    assert len(rec) == 2  # appended, not overwritten

    # Inference through the saved artifacts.
    from radnet_tpu.inference import load_radnet

    radnet = load_radnet(model_dir)
    radnet.bbox_threshold = 0.0
    panel = np.zeros((100, 100, 3), np.uint8)
    panel[20:70, 20:70] = 150
    dets = radnet.predict([panel])
    assert isinstance(dets, list)

    # test.py evaluation path on the synthetic test=val split.
    from radnet_tpu.cli.test import main as test_main

    rc = test_main(
        [
            "--models-path", "models",
            "--model-name", "faster_rcnn_vgg16_smoke",
            "--test-annot", "val.csv",
            "--test-data", "data/val",
            "--coco-map",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(model_dir, "test_accuracy.json"))
    with open(os.path.join(model_dir, "test_accuracy.json")) as f:
        acc = json.load(f)
    assert "mAP" in acc
    # --coco-map extension: per-threshold APs in a separate file; AP50
    # must equal the reference-format single-threshold mAP exactly.
    with open(os.path.join(model_dir, "test_accuracy_coco.json")) as f:
        coco = json.load(f)
    assert coco["AP50"] == acc["mAP"]
    assert len(coco["per_threshold"]) == 10

    # Data-pipeline sanity checker (reference test_data.py workflow).
    from radnet_tpu.cli.test_data import main as test_data_main

    rc = test_data_main(
        [
            "--config-json", "tiny_config.json",
            "--train-annot", "train.csv",
            "--train-data", "data/train",
            "--n-samples", "2",
            "--out-dir", "viz_check",
        ]
    )
    assert rc == 0
    assert os.path.exists("viz_check/test_data_0.png")

    # Anchor analysis (reference test_data.py:54-184, the commented-out
    # KMeans / anchors_summary block): stats + cluster scales + per-anchor
    # positive usage must come out as one JSON report.
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = test_data_main(
            [
                "--config-json", "tiny_config.json",
                "--train-annot", "train.csv",
                "--train-data", "data/train",
                "--analyze-anchors",
                "--usage-samples", "2",
            ]
        )
    assert rc == 0
    out = buf.getvalue()
    report = json.loads(out[out.index("{"):])
    assert report["n_boxes"] > 0
    assert len(report["kmeans_wh_clusters"]) == 3
    usage = report["anchor_usage"]
    assert usage["n_samples"] == 2
    per = usage["positives_per_anchor"]
    assert set(per) == {str(s) for s in cfg.anchor_box_scales}
    total = sum(sum(d.values()) for d in per.values())
    assert total > 0  # some anchor fired on the synthetic boxes

    # RPN-recall debugger (reference test_rpn.py workflow).
    from radnet_tpu.cli.test_rpn import main as test_rpn_main

    rc = test_rpn_main(
        [
            "--models-path", "models",
            "--model-name", "faster_rcnn_vgg16_smoke",
            "--annot", "train.csv",
            "--data", "data/train",
            "--limit", "1",
        ]
    )
    assert rc == 0
    assert os.listdir(os.path.join(model_dir, "test_rpn"))

    # Long-lived serving worker: stream two panels through stdin->stdout.
    import io
    import sys as _sys

    from radnet_tpu.cli.serve import main as serve_main

    panel_path = os.path.join("data", cfg.img_types[0], "train", "train_0.png")
    out_json = "served_0.json"
    monkeypatch.setattr(
        _sys,
        "stdin",
        io.StringIO(
            f"{panel_path}\t{out_json}\n"
            "missing.png\n"
            f"{panel_path}\t/no_such_dir/out.json\n"
        ),
    )
    captured = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", captured)
    rc = serve_main(
        ["--models-path", "models", "--model-name", "faster_rcnn_vgg16_smoke"]
    )
    _sys.stdout = _sys.__stdout__
    assert rc == 0
    lines = [json.loads(l) for l in captured.getvalue().strip().splitlines()]
    assert lines[0]["path"] == panel_path and "detections" in lines[0]
    assert "error" in lines[1]  # bad input keeps the worker alive
    # An unwritable --out-file must not kill the worker or lose the result:
    # the detections come back on stdout with the write error noted.
    assert "detections" in lines[2] and "out_file_error" in lines[2]
    with open(out_json) as f:
        assert json.load(f)["path"] == panel_path

    # --pipeline-depth 2: multiple panels in flight; results must come back
    # in input order with the same detections as the depth-1 run, and an
    # error mid-stream must not disorder or kill the pipeline.
    paths = [panel_path, panel_path, "missing.png", panel_path]
    monkeypatch.setattr(_sys, "stdin", io.StringIO("\n".join(paths) + "\n"))
    captured2 = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", captured2)
    rc = serve_main(
        ["--models-path", "models", "--model-name", "faster_rcnn_vgg16_smoke",
         "--pipeline-depth", "2"]
    )
    _sys.stdout = _sys.__stdout__
    assert rc == 0
    lines2 = [json.loads(l) for l in captured2.getvalue().strip().splitlines()]
    assert [l["path"] for l in lines2] == paths
    assert "error" in lines2[2] and "detections" in lines2[3]
    assert lines2[0]["detections"] == lines[0]["detections"]
    assert lines2[1]["detections"] == lines[0]["detections"]


def test_mesh_cli_end_to_end(workspace, monkeypatch):
    """Multi-chip as a product capability: train, resume and evaluate
    THROUGH the production CLI drivers on an 8-device (4x2 dp x tp) virtual
    mesh, and match the single-device drivers' results.  (The reference has
    no distribution story at all - SURVEY.md §2.12; here --n-devices is a
    first-class flag on every driver.)"""
    import pandas as pd

    tmp, cfg = workspace
    monkeypatch.chdir(tmp)

    import copy

    cfg4 = copy.deepcopy(cfg)
    cfg4.batch_size = 4  # divisible by the dp size of the 4x2 mesh
    cfg4.save("tiny_config_b4.json")

    from radnet_tpu.cli.train import main as train_main

    common = [
        "--config-json", "tiny_config_b4.json",
        "--train-annot", "train.csv",
        "--train-data", "data/train",
        "--val-annot", "val.csv",
        "--val-data", "data/val",
        "--epoch-length", "2",
        "--n-epochs", "2",
        "--num-workers", "1",  # deterministic sample order for comparison
        "--seed", "64",
    ]
    assert train_main(common + ["--model-name", "mesh1"]) == 0
    assert (
        train_main(
            common
            + ["--model-name", "mesh8", "--n-devices", "8", "--model-parallel", "2"]
        )
        == 0
    )

    dir1 = os.path.join("models", "faster_rcnn_vgg16_mesh1")
    dir8 = os.path.join("models", "faster_rcnn_vgg16_mesh8")
    rec1 = pd.read_csv(os.path.join(dir1, "record.csv"))
    rec8 = pd.read_csv(os.path.join(dir8, "record.csv"))
    assert len(rec8) == 2
    # Same data order + same rng streams: the sharded run must track the
    # single-device run within float/collective-reassociation drift.
    np.testing.assert_allclose(
        rec8["total_loss"].to_numpy(float),
        rec1["total_loss"].to_numpy(float),
        rtol=0.05,
        atol=0.05,
    )

    # Resume through the driver, still on the mesh.
    from radnet_tpu.cli.cont_train import main as cont_main

    assert (
        cont_main(
            [
                "--model-name", "faster_rcnn_vgg16_mesh8",
                "--train-annot", "train.csv",
                "--train-data", "data/train",
                "--epoch-length", "2",
                "--n-epochs", "1",
                "--no-validation",
                "--num-workers", "1",
                "--n-devices", "8",
                "--model-parallel", "2",
            ]
        )
        == 0
    )
    assert len(pd.read_csv(os.path.join(dir8, "record.csv"))) == 3

    # Evaluate the SAME trained model through the driver with and without a
    # mesh: detections (and hence mAP) must agree.
    from radnet_tpu.cli.test import main as test_main

    eval_common = [
        "--models-path", "models",
        "--model-name", "faster_rcnn_vgg16_mesh1",
        "--test-annot", "val.csv",
        "--test-data", "data/val",
    ]
    assert test_main(eval_common) == 0
    with open(os.path.join(dir1, "test_accuracy.json")) as f:
        acc1 = json.load(f)
    assert test_main(eval_common + ["--n-devices", "4"]) == 0
    with open(os.path.join(dir1, "test_accuracy.json")) as f:
        acc4 = json.load(f)
    assert acc1.keys() == acc4.keys()
    for k in acc1:
        np.testing.assert_allclose(acc4[k], acc1[k], atol=1e-3, err_msg=k)


def test_map_parity_compare_harness(workspace, monkeypatch):
    """`test.py --compare ref.json` makes mAP parity a single command the
    day reference numbers arrive: per-class deltas + exit code 0/2 against
    the 0.5-pt north star (BASELINE.json)."""
    tmp, cfg = workspace
    monkeypatch.chdir(tmp)

    from radnet_tpu.cli.test import compare_accuracy, main as test_main

    # Pure-function behavior first.
    ours = {"boat": 0.8, "human": 0.6, "mAP": 0.7}
    ok, report = compare_accuracy(ours, {"boat": 0.75, "human": 0.65, "mAP": 0.7})
    assert ok and "PARITY OK" in report and "boat" in report
    ok, report = compare_accuracy(ours, {"boat": 0.9, "human": 0.9, "mAP": 0.9})
    assert not ok and "PARITY FAIL" in report
    ok, _ = compare_accuracy(ours, {"mAP": 0.704})  # within 0.5 pts below
    assert ok
    ok, _ = compare_accuracy(ours, {"mAP": 0.706})
    assert not ok
    ok, report = compare_accuracy(ours, {"wheel": 0.5, "mAP": 0.7})
    assert ok and "n/a" in report  # class-set mismatch is informational

    # Through the driver against the model trained by the earlier test
    # (depends on test_train_cont_and_predict having run in this module).
    import json as _json

    model = "faster_rcnn_vgg16_smoke"
    with open(os.path.join("models", model, "test_accuracy.json")) as f:
        own = _json.load(f)
    with open("fabricated_ref.json", "w") as f:
        _json.dump({**own, "mAP": own["mAP"]}, f)  # parity by construction
    eval_args = [
        "--models-path", "models",
        "--model-name", model,
        "--test-annot", "val.csv",
        "--test-data", "data/val",
        "--compare", "fabricated_ref.json",
    ]
    assert test_main(eval_args) == 0
    with open("fabricated_ref.json", "w") as f:
        _json.dump({**own, "mAP": own["mAP"] + 0.02}, f)  # out of tolerance
    assert test_main(eval_args) == 2
