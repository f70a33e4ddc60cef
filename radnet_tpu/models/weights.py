"""Pretrained backbone-weight porting (Keras ``.h5`` and torchvision).

The reference loads ImageNet weights *by layer name* at model-build time:
``model.load_weights(WEIGHT_PATH, by_name=True)`` for ResNet50
(/root/reference/faster_rcnn/base_models/resnet50.py:17,211-213) and
``keras.applications.VGG16(weights='imagenet')`` for VGG16
(/root/reference/faster_rcnn/base_models/vgg16.py:36-40).  This module
re-creates that contract for the Flax parameter trees:

* :func:`load_keras_h5` - port a Keras-format ``.h5`` by layer name into
  ``params`` / ``batch_stats``.  Handles the reference's
  ``FixedBatchNormalization`` quirk where the fourth BN slot - whether it
  is called ``running_std`` or ``moving_variance`` - always holds the
  **variance** (FixedBatchNormalization.py:46-51,70-73): BN arrays are
  taken *positionally* as (gamma, beta, mean, variance).
* :func:`load_torchvision_resnet50` - port a torchvision ``resnet50``
  ``state_dict`` (OIHW convs -> HWIO, ``layer1..4`` -> stages 2..5).
* :func:`maybe_load_pretrained` - the driver-facing entry point: search
  the conventional locations (reference WEIGHT_PATH, keras/torch caches)
  and load the first hit.

Name maps are exposed for tests as :func:`_resnet_name_map` /
:func:`_vgg_name_map`: lists of ``(keras_name, flax_path, kind)`` where
``flax_path`` indexes ``params`` (``kind == 'conv'``) or ``batch_stats``
(``kind == 'bn'``) and the first path element selects the ``trunk`` or the
stage-5 ``head`` submodule (stage 5 lives in the RoI head here -
resnet50.py:231-280 wraps it in the per-RoI classifier).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import numpy as np

# Reference weight-file location (resnet50.py:17) plus the standard
# keras / torch cache paths.
_RESNET_H5 = "resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5"
_VGG_H5 = "vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5"


def _resnet_name_map() -> list[tuple[str, tuple[str, ...], str]]:
    """Keras ResNet50 layer names -> flax module paths.

    Keras names follow ``res{stage}{block}_branch{2a,2b,2c,1}`` /
    ``bn{stage}{block}_branch{...}`` (resnet50.py:41-147); flax modules are
    ``s{stage}{block}`` with convs ``conv2a/2b/2c`` + projection
    ``conv_sc`` (models/resnet.py::Bottleneck).  Stages 2-4 are the trunk,
    stage 5 is the RoI head.
    """
    m: list[tuple[str, tuple[str, ...], str]] = [
        ("conv1", ("trunk", "conv1"), "conv"),
        ("bn_conv1", ("trunk", "bn_conv1"), "bn"),
    ]
    for stage, blocks in ((2, "abc"), (3, "abcd"), (4, "abcdef"), (5, "abc")):
        root = "trunk" if stage < 5 else "head"
        for i, b in enumerate(blocks):
            mod = f"s{stage}{b}"
            for br, conv, bn in (
                ("2a", "conv2a", "bn2a"),
                ("2b", "conv2b", "bn2b"),
                ("2c", "conv2c", "bn2c"),
            ):
                m.append((f"res{stage}{b}_branch{br}", (root, mod, conv), "conv"))
                m.append((f"bn{stage}{b}_branch{br}", (root, mod, bn), "bn"))
            if i == 0:  # conv_block projection shortcut (resnet50.py:91-117)
                m.append((f"res{stage}{b}_branch1", (root, mod, "conv_sc"), "conv"))
                m.append((f"bn{stage}{b}_branch1", (root, mod, "bn_sc"), "bn"))
    return m


def _vgg_name_map() -> list[tuple[str, tuple[str, ...], str]]:
    """Keras VGG16 conv names (``block{b}_conv{i}``) -> flax trunk paths."""
    m: list[tuple[str, tuple[str, ...], str]] = []
    for block, n_convs in ((1, 2), (2, 2), (3, 3), (4, 3), (5, 3)):
        for i in range(1, n_convs + 1):
            name = f"block{block}_conv{i}"
            m.append((name, ("trunk", name), "conv"))
    return m


def _name_map(network: str) -> list[tuple[str, tuple[str, ...], str]]:
    if network == "resnet50":
        return _resnet_name_map()
    if network == "vgg16":
        return _vgg_name_map()
    raise ValueError(f"unknown network {network!r}")


def _copy_tree(tree: Any) -> Any:
    """Shallow-copy the dict spine of a param tree (leaves shared)."""
    try:  # FrozenDict -> plain dict
        from flax.core import FrozenDict, unfreeze

        if isinstance(tree, FrozenDict):
            tree = unfreeze(tree)
    except Exception:
        pass
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree


def _get(tree: Any, path: Sequence[str]) -> Any:
    node = tree
    for k in path:
        node = node[k]
    return node


def _assign(tree: Any, path: Sequence[str], value: np.ndarray) -> None:
    node = _get(tree, path[:-1])
    target = np.asarray(node[path[-1]])
    if tuple(target.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"file has {value.shape}, model has {target.shape}"
        )
    node[path[-1]] = np.asarray(value, dtype=np.float32)


def load_keras_h5(path, params, batch_stats, network):
    """Load a Keras-format ``.h5`` by layer name.

    Returns ``(new_params, new_batch_stats, loaded)`` where ``loaded`` is
    the list of keras layer names found in the file, in name-map order.
    Layers absent from the file keep their initialization (the by-name
    semantics of resnet50.py:213).
    """
    import h5py

    params = _copy_tree(params)
    batch_stats = _copy_tree(batch_stats)
    loaded: list[str] = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for keras_name, flax_path, kind in _name_map(network):
            if keras_name not in root:
                continue
            g = root[keras_name]
            weight_names = [
                n.decode() if isinstance(n, bytes) else str(n)
                for n in g.attrs["weight_names"]
            ]
            arrays = [np.asarray(g[n]) for n in weight_names]
            if kind == "conv":
                kernel = bias = None
                for n, a in zip(weight_names, arrays):
                    if "kernel" in n or n.endswith("W:0"):
                        kernel = a
                    elif "bias" in n or n.endswith("b:0"):
                        bias = a
                if kernel is None:  # positional fallback
                    kernel = arrays[0]
                    bias = arrays[1] if len(arrays) > 1 else bias
                # Keras conv kernels are already HWIO, same as flax.
                _assign(params, tuple(flax_path) + ("kernel",), kernel)
                if bias is not None:
                    _assign(params, tuple(flax_path) + ("bias",), bias)
            else:  # bn: POSITIONAL gamma, beta, mean, variance.  The 4th
                # slot is the variance whatever its name says -
                # 'running_std' (FixedBatchNormalization.py:46-51) and
                # 'moving_variance' (keras BatchNormalization) alike.
                if len(arrays) != 4:
                    raise ValueError(
                        f"{keras_name}: expected 4 BN arrays, got {len(arrays)}"
                    )
                for field, a in zip(("gamma", "beta", "mean", "var"), arrays):
                    _assign(batch_stats, tuple(flax_path) + (field,), a)
            loaded.append(keras_name)
    return params, batch_stats, loaded


_TORCH_BN_EPS = 1e-5  # torchvision BatchNorm2d default


def load_torchvision_resnet50(state_dict, params, batch_stats):
    """Port a torchvision ``resnet50`` state_dict - an APPROXIMATE port.

    ``layer{1..4}`` -> stages 2..5 (`layer4` lands in the RoI head);
    convs transpose OIHW -> HWIO; torchvision convs are bias-free, so flax
    biases keep their (zero) init.  BN: weight/bias/running_mean/
    running_var -> gamma/beta/mean/var, with gamma pre-scaled by
    ``sqrt((var + eps_keras) / (var + eps_torch))`` so the frozen-BN
    transform reproduces torch's eps=1e-5 exactly under this model's
    eps=1e-3 (models/layers.py:29).

    Two architecture mismatches CANNOT be compensated and make this a
    fine-tuning init rather than a numerics-parity port (prefer a Keras
    ``.h5``, which matches exactly):
    * torchvision resnet50 is v1.5 - the projection blocks stride on the
      3x3 conv2 - while this model follows the reference's Keras v1
      (stride on the 1x1 conv2a + shortcut, resnet50.py:120-147), so
      strided blocks read different spatial phases than the weights were
      trained for;
    * the stem maxpool is VALID here (Keras) vs pad=1 in torch.
    Returns ``(new_params, new_batch_stats)``.
    """
    from radnet_tpu.models.layers import FrozenBatchNorm

    keras_eps = FrozenBatchNorm.epsilon
    params = _copy_tree(params)
    batch_stats = _copy_tree(batch_stats)

    def conv(src: str, path: tuple[str, ...]) -> None:
        w = np.asarray(state_dict[src + ".weight"])
        _assign(params, path + ("kernel",), np.transpose(w, (2, 3, 1, 0)))

    def bn(src: str, path: tuple[str, ...]) -> None:
        var = np.asarray(state_dict[f"{src}.running_var"], np.float64)
        eps_fix = np.sqrt((var + keras_eps) / (var + _TORCH_BN_EPS)).astype(
            np.float32
        )
        for torch_field, field in (
            ("weight", "gamma"),
            ("bias", "beta"),
            ("running_mean", "mean"),
            ("running_var", "var"),
        ):
            a = np.asarray(state_dict[f"{src}.{torch_field}"])
            if field == "gamma":
                a = a * eps_fix  # exact eps compensation (see docstring)
            _assign(batch_stats, path + (field,), a)

    conv("conv1", ("trunk", "conv1"))
    bn("bn1", ("trunk", "bn_conv1"))
    for layer, (stage, n_blocks) in ((1, (2, 3)), (2, (3, 4)), (3, (4, 6)), (4, (5, 3))):
        root = "trunk" if stage < 5 else "head"
        for i in range(n_blocks):
            mod = f"s{stage}{chr(ord('a') + i)}"
            src = f"layer{layer}.{i}"
            conv(f"{src}.conv1", (root, mod, "conv2a"))
            bn(f"{src}.bn1", (root, mod, "bn2a"))
            conv(f"{src}.conv2", (root, mod, "conv2b"))
            bn(f"{src}.bn2", (root, mod, "bn2b"))
            conv(f"{src}.conv3", (root, mod, "conv2c"))
            bn(f"{src}.bn3", (root, mod, "bn2c"))
            if i == 0:
                conv(f"{src}.downsample.0", (root, mod, "conv_sc"))
                bn(f"{src}.downsample.1", (root, mod, "bn_sc"))
    return params, batch_stats


def _candidate_paths(config, search_paths: Sequence[str]) -> list[str]:
    cands = [p for p in search_paths if p]
    w = config.base_net_weights
    if w and w != "imagenet":
        cands.append(w)  # an explicit file path in the config
    fname = _RESNET_H5 if config.network == "resnet50" else _VGG_H5
    home = os.path.expanduser("~")
    cands += [
        fname,
        os.path.join("faster_rcnn", "base_models", fname),  # resnet50.py:17
        os.path.join(home, ".keras", "models", fname),
    ]
    if config.network == "resnet50":
        ckpt_dir = os.path.join(home, ".cache", "torch", "hub", "checkpoints")
        if os.path.isdir(ckpt_dir):
            cands += sorted(
                os.path.join(ckpt_dir, f)
                for f in os.listdir(ckpt_dir)
                if f.startswith("resnet50") and f.endswith((".pth", ".pt"))
            )
    return cands


def maybe_load_pretrained(config, params, batch_stats, search_paths=()):
    """Search for pretrained backbone weights and load the first hit.

    Returns ``(params, batch_stats, source_path_or_None)``.  A no-op
    (``src is None``) when ``config.base_net_weights`` is None or nothing
    is found - the caller decides whether random init is acceptable
    (resnet50 + FrozenBatchNorm is not trainable from random init).
    """
    if config.base_net_weights is None:
        return params, batch_stats, None
    for path in _candidate_paths(config, search_paths):
        if not os.path.isfile(path):
            continue
        if path.endswith((".pth", ".pt")):
            if config.network != "resnet50":
                continue
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            new_params, new_stats = load_torchvision_resnet50(sd, params, batch_stats)
            print(
                f"WARNING: loaded torchvision weights ({path}) as a "
                "fine-tuning init: torchvision resnet50 is v1.5 (stride on "
                "the 3x3 conv) while this model follows the reference's "
                "Keras v1 (stride on the 1x1 + shortcut), and the stem "
                "maxpool padding differs - features are approximate, not "
                "numerics-parity.  Prefer a Keras .h5 weight file."
            )
            return new_params, new_stats, path
        new_params, new_stats, loaded = load_keras_h5(
            path, params, batch_stats, config.network
        )
        if loaded:
            return new_params, new_stats, path
    return params, batch_stats, None
