"""Shared CLI plumbing."""

from __future__ import annotations

import os
import random

import numpy as np


def enable_compile_cache(path: str | None = None) -> None:
    """Persist compiled executables across runs.

    First compiles are expensive (minutes on remote-compiled backends);
    every CLI driver enables the cache so repeated train/eval/predict
    invocations skip them."""
    import jax

    repo_cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("RADNET_COMPILE_CACHE", repo_cache),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

def add_mesh_args(p) -> None:
    """Multi-chip flags shared by every production CLI.

    The reference is strictly single-device (SURVEY.md §2.12); here every
    driver can run over a ``jax.sharding.Mesh``: batches shard their
    leading (tile/sample) axis over the ``data`` axis, and the detector
    head is tensor-sharded over ``model`` (see radnet_tpu/parallel/mesh.py).
    """
    p.add_argument(
        "--n-devices",
        type=int,
        default=None,
        help="run over an n-device jax mesh (data-parallel batches, "
        "tensor-parallel detector head); default: single device",
    )
    p.add_argument(
        "--model-parallel",
        type=int,
        default=1,
        help="model-axis size of the mesh (n_devices/model_parallel = "
        "data-parallel size); only meaningful with --n-devices",
    )


def add_platform_arg(p) -> None:
    """Backend-selection flag shared by every CLI.

    The default backend is whatever jax resolves (the TPU on TPU hosts).
    ``--platform cpu`` runs the same program on the host CPU - useful on
    TPU-less machines and during TPU-backend outages (the tunneled
    backend can be unavailable for long stretches; the detector is small
    enough that CPU eval/predict is slow but usable)."""
    p.add_argument(
        "--platform",
        choices=["cpu", "tpu"],
        default=None,
        help="jax backend to run on; default: the platform jax resolves "
        "(the TPU on TPU hosts). 'cpu' forces host-CPU execution",
    )


def apply_platform(args) -> None:
    """Apply --platform before anything touches a device.

    Uses ``jax.config.update`` (NOT the JAX_PLATFORMS env var, which
    site customizations can override).  Must run before the first device
    use; no module in this package initializes the backend at import, so
    calling this right after ``parse_args`` is early enough."""
    plat = getattr(args, "platform", None)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def add_quantize_arg(p) -> None:
    """Serving-time quantization flag shared by the inference CLIs."""
    p.add_argument(
        "--quantize",
        choices=["int8", "none"],
        default=None,
        help="run the RoI head in int8 on the MXU (2x bf16 peak; "
        "measure the mAP delta first - see models/quant.py). "
        "'none' overrides a saved config.infer_quantize; default: "
        "whatever the model dir's config.json says",
    )


def quantize_from_args(args) -> str | None:
    q = getattr(args, "quantize", None)
    if q is None:
        return None
    return "" if q == "none" else q


def mesh_from_args(args):
    """Build the (data x model) mesh requested by --n-devices, or None."""
    n = getattr(args, "n_devices", None)
    if not n:
        return None
    from radnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n, model_parallel=getattr(args, "model_parallel", 1))
    shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    print(f"Using {n}-device mesh: data={shape['data']} model={shape['model']}")
    return mesh


# Local word pool replacing the reference's HTTP-fetched dictionary
# (train.py:60-70 downloads a word list from svnweb.freebsd.org at train time -
# a network failure point designed out here, per SURVEY.md §5.3).
_NAME_WORDS = [
    "Aurora", "Basalt", "Cairn", "Dolmen", "Ember", "Fjord", "Granite",
    "Heather", "Inlet", "Juniper", "Kelp", "Lichen", "Menhir", "Njord",
    "Ochre", "Petroglyph", "Quartz", "Runestone", "Skerry", "Tanum",
    "Umber", "Vitlycke", "Wheel", "Yarrow", "Zephyr",
]


def silly_name_gen(rng: random.Random | None = None) -> str:
    rng = rng or random.Random()
    return "_".join(rng.choice(_NAME_WORDS) for _ in range(2))


def draw_detections(img: np.ndarray, detections, color=(255, 255, 255)) -> np.ndarray:
    """Annotate detections on an image like test.py:207-217."""
    import cv2

    for d in detections:
        cv2.rectangle(img, (d["x1"], d["y1"]), (d["x2"], d["y2"]), color, 8)
        label = "{}: {}".format(d["class"], int(100 * d["prob"]))
        (tw, th), baseline = cv2.getTextSize(label, cv2.FONT_HERSHEY_COMPLEX, 1, 1)
        org = (d["x1"], d["y1"])
        cv2.rectangle(
            img,
            (org[0] - 5, org[1] + baseline - 5),
            (org[0] + tw + 5, org[1] - th - 5),
            (255, 255, 255),
            -1,
        )
        cv2.putText(img, label, org, cv2.FONT_HERSHEY_DUPLEX, 1, (0, 0, 0), 1)
    return img


def model_dir(models_path: str, model_name: str) -> str:
    return os.path.join(models_path, model_name)
