"""Pretrained-weight porting: Keras h5 name mapping and torch layout."""

import numpy as np
import jax
import pytest

from radnet_tpu.models.detector import build_model
from radnet_tpu.models.weights import (
    _resnet_name_map,
    _vgg_name_map,
    load_keras_h5,
    load_torchvision_resnet50,
)
from tests.util import tiny_config


def _init(network):
    cfg = tiny_config(network)
    model = build_model(cfg)
    s = cfg.canvas_size
    import jax.numpy as jnp

    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, s, s, 3)),
        jnp.asarray([[[0.0, 0.0, 2.0, 2.0]]]),
    )
    return variables["params"], variables.get("batch_stats", {})


def test_resnet_name_map_covers_all_blocks():
    m = _resnet_name_map()
    names = [k for k, _, _ in m]
    # 1 stem conv+bn, stages 2..5 with (3,4,6,3) blocks x 3 conv+3 bn,
    # plus 1 projection conv+bn per stage
    assert "conv1" in names and "bn_conv1" in names
    assert "res2a_branch1" in names and "bn5c_branch2c" in names
    assert "res4f_branch2a" in names
    n_convs = sum(1 for _, _, kind in m if kind == "conv")
    n_bns = sum(1 for _, _, kind in m if kind == "bn")
    assert n_convs == n_bns == 1 + (3 + 4 + 6 + 3) * 3 + 4


def test_load_keras_h5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    params, stats = _init("vgg16")

    # Build a fake Keras-format h5 holding block1_conv1 weights.
    shape = np.asarray(params["trunk"]["block1_conv1"]["kernel"]).shape
    kernel = np.random.default_rng(0).normal(size=shape).astype(np.float32)
    bias = np.arange(shape[-1], dtype=np.float32)
    path = tmp_path / "w.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("block1_conv1")
        g.attrs["weight_names"] = [b"block1_conv1/kernel:0", b"block1_conv1/bias:0"]
        g.create_dataset("block1_conv1/kernel:0", data=kernel)
        g.create_dataset("block1_conv1/bias:0", data=bias)

    new_params, new_stats, loaded = load_keras_h5(str(path), params, stats, "vgg16")
    assert loaded == ["block1_conv1"]
    np.testing.assert_array_equal(new_params["trunk"]["block1_conv1"]["kernel"], kernel)
    np.testing.assert_array_equal(new_params["trunk"]["block1_conv1"]["bias"], bias)
    # untouched layers keep their init
    np.testing.assert_array_equal(
        np.asarray(new_params["trunk"]["block2_conv1"]["kernel"]),
        np.asarray(params["trunk"]["block2_conv1"]["kernel"]),
    )


def test_load_keras_h5_resnet_bn_field_order(tmp_path):
    h5py = pytest.importorskip("h5py")
    params, stats = _init("resnet50")
    c = np.asarray(stats["trunk"]["bn_conv1"]["gamma"]).shape[0]
    arrays = [np.full(c, v, np.float32) for v in (2.0, 3.0, 4.0, 5.0)]
    path = tmp_path / "w.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("bn_conv1")
        names = [b"gamma:0", b"beta:0", b"moving_mean:0", b"moving_variance:0"]
        g.attrs["weight_names"] = names
        for n, a in zip(names, arrays):
            g.create_dataset(n.decode(), data=a)
    _, new_stats, loaded = load_keras_h5(str(path), params, stats, "resnet50")
    assert loaded == ["bn_conv1"]
    bn = new_stats["trunk"]["bn_conv1"]
    # keras order gamma, beta, mean, variance; reference 'running_std' IS
    # the variance (FixedBatchNormalization.py:46,70-73)
    np.testing.assert_array_equal(bn["gamma"], arrays[0])
    np.testing.assert_array_equal(bn["beta"], arrays[1])
    np.testing.assert_array_equal(bn["mean"], arrays[2])
    np.testing.assert_array_equal(bn["var"], arrays[3])


def test_torchvision_port_transposes_convs():
    params, stats = _init("resnet50")
    # synthetic state_dict with just the stem (other keys missing -> KeyError
    # guarded by building the full dict lazily); build minimal full dict
    rng = np.random.default_rng(0)
    sd = {}

    def conv_entry(name, out_c, in_c, k):
        sd[name + ".weight"] = rng.normal(size=(out_c, in_c, k, k)).astype(np.float32)

    def bn_entry(name, c):
        for f, v in (("weight", 1.0), ("bias", 0.0), ("running_mean", 0.0), ("running_var", 1.0)):
            sd[name + "." + f] = np.full(c, v, np.float32)

    conv_entry("conv1", 64, 3, 7)
    bn_entry("bn1", 64)
    plan = [(1, 3, 64, 256), (2, 4, 128, 512), (3, 6, 256, 1024), (4, 3, 512, 2048)]
    for layer, blocks, mid, out in plan:
        in_c = {1: 64, 2: 256, 3: 512, 4: 1024}[layer]
        for i in range(blocks):
            src = f"layer{layer}.{i}"
            c_in = in_c if i == 0 else out
            conv_entry(f"{src}.conv1", mid, c_in, 1)
            bn_entry(f"{src}.bn1", mid)
            conv_entry(f"{src}.conv2", mid, mid, 3)
            bn_entry(f"{src}.bn2", mid)
            conv_entry(f"{src}.conv3", out, mid, 1)
            bn_entry(f"{src}.bn3", out)
            if i == 0:
                conv_entry(f"{src}.downsample.0", out, c_in, 1)
                bn_entry(f"{src}.downsample.1", out)

    new_params, new_stats = load_torchvision_resnet50(sd, params, stats)
    got = np.asarray(new_params["trunk"]["conv1"]["kernel"])  # HWIO
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)
    # stage-5 head receives layer4
    got5 = np.asarray(new_params["head"]["s5a"]["conv2a"]["kernel"])
    want5 = np.transpose(sd["layer4.0.conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got5, want5)
