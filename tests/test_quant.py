"""Int8 quantized-inference tests (models/quant.py).

The quant path is a TPU serving optimization with no reference
counterpart; these tests pin (a) the numerics of the int8 ops against
their float equivalents, (b) param-tree compatibility (checkpoints trained
float load unchanged), and (c) that training always runs the float path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radnet_tpu.models.detector import build_model
from radnet_tpu.models.quant import int8_conv, int8_dense, quantize_sym
from tests.util import tiny_config


def rel_l2(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-12)


def test_quantize_sym_roundtrip_and_zero():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3.0, (4, 64)).astype(np.float32))
    q, s = quantize_sym(x, axes=(1,))
    assert q.dtype == jnp.int8
    assert s.shape == (4, 1)
    # q*s reconstructs x to half-ULP of the int8 grid
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    step = np.asarray(s)
    assert (err <= step / 2 + 1e-7).all()
    # max magnitude maps to exactly +-127
    assert np.abs(np.asarray(q)).max() == 127

    # all-zero slices: finite scale, q == 0
    z = jnp.zeros((2, 8))
    qz, sz = quantize_sym(z, axes=(1,))
    assert np.isfinite(np.asarray(sz)).all()
    assert (np.asarray(qz) == 0).all()


def test_int8_dense_matches_float():
    rng = np.random.default_rng(1)
    # wildly different per-row magnitudes: the per-sample activation scale
    # must absorb them (a per-tensor scale would fail this test)
    x = rng.normal(0, 1, (128, 256)).astype(np.float32)
    x *= np.logspace(-2, 3, 128)[:, None].astype(np.float32)
    w = rng.normal(0, 0.05, (256, 64)).astype(np.float32)
    w[:, 7] *= 100.0  # outlier channel: per-out-channel weight scale
    got = int8_dense(jnp.asarray(x), jnp.asarray(w))
    want = x @ w
    assert got.dtype == jnp.float32
    # error is ~1% of the OUTPUT DISTRIBUTION scale; judge each column
    # against its own norm over the 128 rows (single dot products land
    # anywhere in N(0, sqrt(D)*sx*sw), so per-element relative error is
    # meaningless - per-column L2 over many rows concentrates)
    colerr = np.linalg.norm(np.asarray(got) - want, axis=0)
    colnorm = np.linalg.norm(want, axis=0)
    assert (colerr < 0.03 * colnorm).all()


def test_int8_conv_matches_float():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 7, 7, 32)).astype(np.float32)
    x[1] *= 50.0  # per-sample scale coverage
    w = rng.normal(0, 0.1, (3, 3, 32, 16)).astype(np.float32)
    got = int8_conv(jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME")
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert rel_l2(got, np.asarray(want)) < 0.02

    # strided VALID path (the head's 1x1 projection convs)
    got = int8_conv(jnp.asarray(x), jnp.asarray(w[1:2, 1:2]), (2, 2), "VALID")
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w[1:2, 1:2]), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert rel_l2(got, np.asarray(want)) < 0.02


@pytest.mark.parametrize("network", ["vgg16", "resnet50"])
def test_quant_model_param_compatible_and_close(network):
    """head_quant='int8' must (a) keep the param tree byte-identical to the
    float model (checkpoint compatibility), (b) produce near-float
    detections at inference, (c) be bit-equal to float in training mode."""
    cfg = tiny_config(network)
    fmodel = build_model(cfg)
    cfg.infer_quantize = "int8"
    qmodel = build_model(cfg)

    s = cfg.canvas_size
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(0, 64, (1, s, s, 3)).astype(np.float32))
    rois = jnp.asarray([[[0.0, 0.0, 3.0, 3.0], [1.0, 1.0, 2.0, 2.0]]])
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    fvars = fmodel.init(rngs, img, rois)
    qvars = qmodel.init(rngs, img, rois)

    def decisive(v):
        # the output heads are zero-init (reference parity), which would
        # swallow any fc/stage-5 difference - give them signal
        p = jax.device_get(v["params"])
        r = np.random.default_rng(9)
        for k in ("dense_class", "dense_regress"):
            a = p["head"][k]["kernel"]
            scale = 1.0 / np.sqrt(a.shape[0])  # keep softmax unsaturated
            p["head"][k]["kernel"] = r.normal(0, scale, a.shape).astype(a.dtype)
        return {**v, "params": p}

    # (a) identical trees: same paths, shapes, dtypes, and (same seed)
    # identical values - a float checkpoint loads into the quant model
    fleaves = jax.tree_util.tree_leaves_with_path(fvars)
    qleaves = jax.tree_util.tree_leaves_with_path(qvars)
    assert [p for p, _ in fleaves] == [p for p, _ in qleaves]
    for (_, a), (_, b) in zip(fleaves, qleaves):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) inference: close but not identical (proves the int8 path runs)
    dvars = decisive(fvars)
    (_, _), (fcls, fregr) = fmodel.apply(dvars, img, rois, deterministic=True)
    (_, _), (qcls, qregr) = qmodel.apply(dvars, img, rois, deterministic=True)
    # regr is linear in the head features, so the int8 path must leave a
    # (small) trace there; cls may saturate, so it only gets the atol bound
    assert not np.array_equal(np.asarray(fregr), np.asarray(qregr))
    np.testing.assert_allclose(np.asarray(qcls), np.asarray(fcls), atol=0.05)
    assert np.abs(np.asarray(qregr) - np.asarray(fregr)).max() < 0.05 * max(
        float(jnp.abs(fregr).max()), 1e-3
    )

    # (c) training mode: the quant model IS the float model, bitwise
    drng = {"dropout": jax.random.PRNGKey(7)}
    (_, _), (ftr, _) = fmodel.apply(dvars, img, rois, deterministic=False, rngs=drng)
    (_, _), (qtr, _) = qmodel.apply(dvars, img, rois, deterministic=False, rngs=drng)
    np.testing.assert_array_equal(np.asarray(ftr), np.asarray(qtr))


def test_quant_model_train_grads_flow():
    """Grad through the quant model in training mode equals the float
    model's grad (the int8 path, whose round() would zero gradients, must
    never be differentiated)."""
    cfg = tiny_config("vgg16")
    cfg.infer_quantize = "int8"
    qmodel = build_model(cfg)
    fcfg = tiny_config("vgg16")
    fmodel = build_model(fcfg)

    s = cfg.canvas_size
    img = jnp.ones((1, s, s, 3), jnp.float32)
    rois = jnp.asarray([[[0.0, 0.0, 3.0, 3.0]]])
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = fmodel.init(rngs, img, rois)
    # zero-init output heads (reference parity) block the fc gradients;
    # give dense_class signal so grads reach fc1
    p = jax.device_get(variables["params"])
    r = np.random.default_rng(5)
    a = p["head"]["dense_class"]["kernel"]
    p["head"]["dense_class"]["kernel"] = r.normal(0, 0.05, a.shape).astype(a.dtype)
    variables = {**variables, "params": p}

    def loss(model, params):
        (rc, rr), (dc, dr) = model.apply(
            {**variables, "params": params}, img, rois,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(dc ** 2) + jnp.sum(rc ** 2)

    gq = jax.grad(lambda p: loss(qmodel, p))(variables["params"])
    gf = jax.grad(lambda p: loss(fmodel, p))(variables["params"])
    chex_equal = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        gq, gf,
    )
    del chex_equal
    # and the head fc1 grad is actually nonzero
    assert float(jnp.abs(gq["head"]["fc1"]["kernel"]).max()) > 0


def test_load_radnet_quantize_override(tmp_path):
    """load_radnet(quantize=...) overrides the saved config without
    touching the checkpoint; '' clears a saved setting."""
    import jax.random as jrandom

    from radnet_tpu.engine.checkpoint import save_checkpoint
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.inference import load_radnet

    cfg = tiny_config("vgg16")
    model_dir = tmp_path / "m"
    model_dir.mkdir()
    cfg.save(str(model_dir / "config.json"))
    state = create_train_state(build_model(cfg), cfg, jrandom.PRNGKey(0))
    save_checkpoint(str(model_dir / "ckpt_best"), state)

    r = load_radnet(str(model_dir), quantize="int8")
    assert r.C.infer_quantize == "int8"
    r = load_radnet(str(model_dir))
    assert r.C.infer_quantize is None
    r = load_radnet(str(model_dir), quantize="")
    assert r.C.infer_quantize is None
