"""CLI helpers: predict.py scan-layout resolution, name generator."""

from pathlib import Path

import pytest

from radnet_tpu.cli.common import silly_name_gen
from radnet_tpu.cli.predict import resolve_type_path


def test_resolve_type_path_variants():
    """Mirror of the reference's layout switch (predict.py:59-81)."""
    root = "/scan"
    cases = {
        "enhanced_topo_grey": "img/enhanced_topo_maps/enhanced_topo_map_object_level_grey.png",
        "enhanced_topo": "img/enhanced_topo_maps/enhanced_topo_map_object_level.png",
        "blended_map_grey": "img/blended_maps/blended_map_object_level_grey.png",
        "blended_map": "img/blended_maps/blended_topo_map_object_level.png",
        "topo_grey": "img/topo_maps/topo_map_object_level_grey.png",
        "topo": "img/topo_maps/topo_map_object_level.png",
    }
    for img_type, rel in cases.items():
        assert resolve_type_path(root, img_type) == Path(root) / rel, img_type

    with pytest.raises(ValueError):
        resolve_type_path(root, "unknown_kind")


def test_silly_name_gen_local_and_deterministic():
    import random

    a = silly_name_gen(random.Random(7))
    b = silly_name_gen(random.Random(7))
    assert a == b and "_" in a


def test_root_wrappers_import_their_cli_main():
    """Every root entry-point wrapper resolves to its radnet_tpu.cli main."""
    import importlib.util
    import re

    root = Path(__file__).resolve().parent.parent
    for name in ("train", "cont_train", "test", "predict",
                 "test_data", "test_rpn", "serve"):
        src = (root / f"{name}.py").read_text()
        m = re.search(r"from radnet_tpu\.cli\.(\w+) import main", src)
        assert m, name
        assert m.group(1) == name
        mod = importlib.import_module(f"radnet_tpu.cli.{name}")
        assert callable(mod.main), name


def test_every_cli_accepts_platform_and_applies_it():
    """--platform is on all seven CLIs and apply_platform sets the jax
    backend config (the env var is overridden by site customizations on
    tunneled hosts, so the flag must go through jax.config)."""
    import importlib

    import jax

    from radnet_tpu.cli.common import apply_platform

    for name in ("train", "cont_train", "test", "predict",
                 "test_data", "test_rpn", "serve"):
        mod = importlib.import_module(f"radnet_tpu.cli.{name}")
        p = mod.build_argparser()
        platform_actions = [
            a for a in p._actions if "--platform" in a.option_strings
        ]
        assert platform_actions, name
        assert platform_actions[0].choices == ["cpu", "tpu"], name

    class A:
        platform = "cpu"

    apply_platform(A())  # conftest already forces cpu; must be a no-op
    assert jax.config.jax_platforms == "cpu"


def test_quantize_arg_mapping():
    from radnet_tpu.cli.common import quantize_from_args

    class A:
        quantize = None

    assert quantize_from_args(A()) is None
    A.quantize = "int8"
    assert quantize_from_args(A()) == "int8"
    A.quantize = "none"
    assert quantize_from_args(A()) == ""  # load_radnet maps "" -> cleared
