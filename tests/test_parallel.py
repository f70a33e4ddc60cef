"""Mesh sharding: dp x tp train step on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from radnet_tpu.engine.steps import make_train_step
from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.models.detector import build_model
from radnet_tpu.parallel import batch_sharding, make_mesh, make_param_shardings, shard_train_state
from radnet_tpu.parallel.mesh import MODEL_AXIS
from tests.util import decisive_detector_params, synthetic_batch, tiny_config


def test_make_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_param_shardings_tp_rules():
    cfg = tiny_config("vgg16")
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(8, model_parallel=2)
    sh = make_param_shardings(state.params, mesh)
    fc1 = sh["head"]["fc1"]["kernel"]
    assert fc1.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    fc2 = sh["head"]["fc2"]["kernel"]
    assert fc2.spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
    # everything else replicated
    assert sh["trunk"]["block1_conv1"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_param_shardings_resnet50_head_tp_rules():
    """The flagship ResNet50's stage-5 head must actually shard under
    --model-parallel (round-3 VERDICT: TP was a silent no-op for the
    default network). Megatron split: conv2a row-parallel, conv2c (and
    s5a's projection shortcut) column-parallel, dense_* row-parallel."""
    from jax.sharding import PartitionSpec as P

    cfg = tiny_config("resnet50")
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(8, model_parallel=2)
    sh = make_param_shardings(state.params, mesh)
    head = sh["head"]
    for blk in ("s5a", "s5b", "s5c"):
        assert head[blk]["conv2a"]["kernel"].spec == P(None, None, MODEL_AXIS, None)
        assert head[blk]["conv2b"]["kernel"].spec == P()
        assert head[blk]["conv2c"]["kernel"].spec == P(None, None, None, MODEL_AXIS)
        assert head[blk]["conv2c"]["bias"].spec == P(MODEL_AXIS)
    assert head["s5a"]["conv_sc"]["kernel"].spec == P(None, None, None, MODEL_AXIS)
    assert head["dense_class"]["kernel"].spec == P(MODEL_AXIS, None)
    assert head["dense_regress"]["kernel"].spec == P(MODEL_AXIS, None)
    # trunk bottlenecks (same conv names, s2*-s4* blocks) stay replicated
    assert sh["trunk"]["s4f"]["conv2c"]["kernel"].spec == P()


def test_noop_tp_warns(capsys):
    """--model-parallel that shards zero params must say so (VERDICT weak
    #6: silent replication)."""
    mesh = make_mesh(8, model_parallel=2)
    fake_params = {"some": {"layer": {"kernel": np.zeros((4, 4), np.float32)}}}
    make_param_shardings(fake_params, mesh, warn_label="model")
    err = capsys.readouterr().err  # stderr: stdout is reserved for JSON
    assert "0 model parameters matched" in err
    # and a matching tree stays silent
    cfg = tiny_config("resnet50")
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    make_param_shardings(state.params, mesh, warn_label="model")
    assert "matched" not in capsys.readouterr().err


def test_sharded_resnet50_cascade_matches_single_device():
    """The ResNet50 cascade with a tensor-sharded stage-5 head on the 4x2
    mesh must reproduce the single-device detections (VERDICT-r3 item 2)."""
    from radnet_tpu.inference import RADNet

    cfg = tiny_config("resnet50")
    cfg.infer_tile_batch = 4
    cfg.bbox_threshold = 0.0
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    params = decisive_detector_params(state.params)

    imgs = np.random.default_rng(3).integers(
        0, 255, (4, cfg.canvas_size, cfg.canvas_size, 3), dtype=np.uint8
    )
    wh = np.full((4, 2), float(cfg.img_size), np.float32)

    single = RADNet(cfg, model, params, state.batch_stats)
    b1, s1, v1 = jax.device_get(single._predict_tiles(jnp.asarray(imgs), jnp.asarray(wh)))

    mesh = make_mesh(8, model_parallel=2)
    with mesh:
        sharded = RADNet(cfg, model, params, state.batch_stats, mesh=mesh)
        b2, s2, v2 = jax.device_get(sharded._predict_tiles(imgs, wh))

    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_sharded_inference_matches_single_device():
    """Tile batch sharded over the data axis: same detections as 1 device."""
    from radnet_tpu.inference import RADNet

    cfg = tiny_config("vgg16")
    cfg.infer_tile_batch = 4
    cfg.bbox_threshold = 0.0
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))

    imgs = np.random.default_rng(0).integers(
        0, 255, (4, cfg.canvas_size, cfg.canvas_size, 3), dtype=np.uint8
    )
    wh = np.full((4, 2), float(cfg.img_size), np.float32)

    single = RADNet(cfg, model, state.params, state.batch_stats)
    b1, s1, v1 = jax.device_get(single._predict_tiles(jnp.asarray(imgs), jnp.asarray(wh)))

    # dp-only mesh AND a dp x tp mesh (serving tensor-shards the head too).
    for mp in (1, 2):
        mesh = make_mesh(4 * mp, model_parallel=mp)
        with mesh:
            sharded = RADNet(cfg, model, state.params, state.batch_stats, mesh=mesh)
            b2, s2, v2 = jax.device_get(sharded._predict_tiles(imgs, wh))

        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_sharded_train_step_matches_single_device():
    cfg = tiny_config("vgg16")
    model = build_model(cfg)
    step = make_train_step(model, cfg)
    batch_np = synthetic_batch(cfg, batch=4)
    rng = jax.random.PRNGKey(7)

    # single-device run
    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, metrics_single = step(state0, batch1, rng)
    metrics_single = jax.device_get(metrics_single)

    # 4x2 mesh run (dp over the 4-sample batch, tp over the head)
    mesh = make_mesh(8, model_parallel=2)
    with mesh:
        state_sh = shard_train_state(
            create_train_state(model, cfg, jax.random.PRNGKey(0)), mesh
        )
        batch_sh = jax.device_put(batch_np, batch_sharding(mesh))
        new_state, metrics_mesh = step(state_sh, batch_sh, rng)
        metrics_mesh = jax.device_get(metrics_mesh)
        jax.block_until_ready(new_state.params)

    for k in ("total_loss", "loss_rpn_cls", "loss_detector_cls"):
        np.testing.assert_allclose(
            metrics_single[k], metrics_mesh[k], rtol=2e-3, atol=2e-4
        )


def test_sharded_panel_predict_matches_single_device():
    """End-to-end sharded serving: RADNet.predict on a tiled panel over a
    mesh (device tiling composes with the data-axis sharding - panel
    replicated, origin batches sharded) produces the same detections as the
    single-device path."""
    from radnet_tpu.inference import RADNet

    cfg = tiny_config("vgg16")
    cfg.bbox_threshold = 0.0
    cfg.infer_tile_batch = 4  # divisible by the data axis
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    panel = np.random.default_rng(9).integers(0, 255, (130, 140, 3), dtype=np.uint8)
    assert panel.shape[0] >= cfg.tile_size  # device-tiling path active

    single = RADNet(cfg, model, state.params, state.batch_stats)
    dets1 = single.predict([panel])

    mesh = make_mesh(4, model_parallel=1)
    with mesh:
        sharded = RADNet(cfg, model, state.params, state.batch_stats, mesh=mesh)
        dets2 = sharded.predict([panel])

    key = lambda d: (d["class"], d["x1"], d["y1"], d["x2"], d["y2"], round(d["prob"], 5))
    assert sorted(map(key, dets1)) == sorted(map(key, dets2))


def _collect_by_suffix(tree, suffix):
    """All leaves whose dict-key path ends with ``suffix``."""
    out = []

    def visit(path, leaf):
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        if keys[-len(suffix):] == suffix:
            out.append((path, leaf))

    jax.tree_util.tree_map_with_path(visit, tree)
    return out


def test_tp_optimizer_moments_follow_param_sharding():
    """Adam moments for the tensor-sharded head must be placed by the SAME
    rules as the params they mirror - before AND after a step on the mesh.
    A comment-level 'GSPMD will re-place them' is not enough: replicated
    moments next to model-sharded params would reshard every step (the VGG
    fc1 moments are ~2x100M floats at real scale)."""
    from jax.sharding import PartitionSpec as P

    cfg = tiny_config("vgg16")
    model = build_model(cfg)
    step = make_train_step(model, cfg)
    mesh = make_mesh(8, model_parallel=2)
    with mesh:
        state = shard_train_state(
            create_train_state(model, cfg, jax.random.PRNGKey(0)), mesh
        )

        def check(st, when):
            from jax.sharding import NamedSharding

            for suffix, want in (
                (("head", "fc1", "kernel"), P(None, MODEL_AXIS)),
                (("head", "fc1", "bias"), P(MODEL_AXIS)),
                (("head", "fc2", "kernel"), P(MODEL_AXIS, None)),
            ):
                moments = _collect_by_suffix(st.opt_state, suffix)
                assert len(moments) >= 2, (when, suffix)  # mu and nu
                for path, leaf in moments:
                    # spec comparison must be layout-equivalence (GSPMD
                    # drops trailing Nones), not string equality
                    assert leaf.sharding.is_equivalent_to(
                        NamedSharding(mesh, want), leaf.ndim
                    ), (when, path, leaf.sharding)
                params = _collect_by_suffix(st.params, suffix)
                assert len(params) == 1
                leaf = params[0][1]
                assert leaf.sharding.is_equivalent_to(
                    NamedSharding(mesh, want), leaf.ndim
                ), (when, suffix, leaf.sharding)

        check(state, "before step")
        batch = jax.device_put(synthetic_batch(cfg, batch=4), batch_sharding(mesh))
        new_state, _ = step(state, batch, jax.random.PRNGKey(7))
        jax.block_until_ready(new_state.params)
        check(new_state, "after step")


def test_mesh_radnet_does_not_mutate_config():
    """A mesh RADNet bumps its EFFECTIVE tile batch to a data-axis multiple
    on self.tile_batch without writing through to the shared, saveable
    Config (a driver that later saves or reuses the config must see the
    value it configured)."""
    from radnet_tpu.inference import RADNet

    cfg = tiny_config("vgg16")
    cfg.infer_tile_batch = 3  # not divisible by the 4-way data axis
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(4, model_parallel=1)
    with mesh:
        sharded = RADNet(cfg, model, state.params, state.batch_stats, mesh=mesh)
    assert sharded.tile_batch == 4
    assert cfg.infer_tile_batch == 3
    # The schedule must run off the effective batch: 5 tiles -> one full
    # batch of 4 plus a tail (half=2 is not data-axis divisible -> full).
    assert sharded._batch_schedule(5) == [(0, 4), (4, 4)]
