"""Fused jitted train / eval steps.

One compiled program per optimizer step, containing everything the
reference spreads over four host<->device round-trips and three backbone
passes (/root/reference/train.py:288-402):

  backbone forward (once) -> RPN heads -> RPN losses
    -> proposal decode + NMS (stop-gradient)
    -> second-stage target assignment + balanced RoI sampling
    -> RoI pooling + detector head -> detector losses
    -> joint gradient -> one optimizer update.

Training semantics vs the reference: the reference updates the RPN first
and computes proposals from the *just-updated* RPN (train.py:288-291), then
updates the shared trunk a second time through the detector loss with a
second Adam state.  The fused step is the Faster R-CNN paper's "approximate
joint training": proposals come from the pre-update RPN (a one-step lag)
and a single optimizer updates the shared trunk once with the summed loss.
This is the standard formulation and is what makes single-pass fusion
possible (see SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from radnet_tpu import losses
from radnet_tpu.config import Config
from radnet_tpu.engine.train_state import TrainState
from radnet_tpu.models.detector import FasterRCNN
from radnet_tpu.ops.proposals import batched_decode_proposals
from radnet_tpu.ops.targets import proposal_targets, rpn_targets


def feature_extent(length: jnp.ndarray, network: str) -> jnp.ndarray:
    """Feature-map extent for a (dynamic) valid image extent.

    Matches get_img_output_length: vgg16.py:18-23 (``//16``) and
    resnet50.py:19-35 (zero-pad +6, four strided convs)."""
    v = length.astype(jnp.int32)
    if network == "vgg16":
        return v // 16
    v = v + 6
    for f in (7, 3, 1, 1):
        v = (v - f + 2) // 2
    return v


def _augment_and_preprocess(
    config: Config, images: jnp.ndarray, rng: jax.Array, deterministic: bool
) -> jnp.ndarray:
    """On-device photometric augmentation (training only) + mean-centering.

    Photometric augmentation runs here on device when configured (the
    host pipeline then skips its brightness/noise stage): elementwise VPU
    work on canvases that are already on device.  The eval step passes
    deterministic=True, matching the reference's augment=False validation
    generator (utils.py:334).  uint8 canvases are mean-centered on device
    (pipeline ships raw bytes to quarter the host->device traffic); float
    batches are pre-centered and pass through."""
    from radnet_tpu.data.pipeline import preprocess_on_device

    if (
        not deterministic
        and config.augment_photometric_on_device
        and (config.use_brightness or config.use_noise)
        and images.dtype == jnp.uint8  # float batches are pre-centered
    ):
        from radnet_tpu.ops.augment_device import grey_mode, photometric_augment

        images = photometric_augment(
            images,
            jax.random.fold_in(rng, 7),
            grey=grey_mode(config),
            use_brightness=config.use_brightness,
            use_noise=config.use_noise,
        ).astype(jnp.uint8)  # values are floored/rinted into 0..255
    return preprocess_on_device(images)


def _batch_rpn_targets(
    config: Config,
    batch: dict[str, jnp.ndarray],
    rng_t: jax.Array,
    img_anchors: jnp.ndarray | None,
    sample_valid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """RPN targets (device-side calc_region_props; no param dependency)."""
    b = sample_valid.shape[0]
    tgt_fn = functools.partial(
        rpn_targets,
        feat_h=config.feat_size,
        feat_w=config.feat_size,
        scales=tuple(config.anchor_box_scales),
        ratios=tuple(tuple(r) for r in config.anchor_box_ratios),
        stride=config.rpn_stride,
        rpn_min_overlap=config.rpn_min_overlap,
        rpn_max_overlap=config.rpn_max_overlap,
        max_regions=config.rpn_max_regions,
        std_scaling=config.std_scaling,
        anchors_xyxy=img_anchors,
        reference_neg_budget=config.rpn_reference_neg_budget,
        fallback_min_iou=config.rpn_fallback_min_iou,
    )
    tgts = jax.vmap(tgt_fn)(
        batch["gt_boxes"],
        batch["gt_mask"],
        batch["valid_wh"][:, 0],
        batch["valid_wh"][:, 1],
        jax.random.split(rng_t, b),
    )
    # Padded samples in partial batches contribute nothing.
    sv = sample_valid[:, None, None, None]
    return tgts.y_rpn_cls * sv, tgts.y_rpn_regr * sv


def _proposals_and_roi_targets(
    config: Config,
    rpn_cls: jnp.ndarray,
    rpn_regr: jnp.ndarray,
    batch: dict[str, jnp.ndarray],
    rng_p: jax.Array,
    feat_anchors: jnp.ndarray | None,
    sample_valid: jnp.ndarray,
):
    """Proposals (no gradient through the decode, like the reference's
    predict_on_batch hop, train.py:291) and second-stage targets."""
    b = sample_valid.shape[0]
    valid_fw = feature_extent(batch["valid_wh"][:, 0], config.network)
    valid_fh = feature_extent(batch["valid_wh"][:, 1], config.network)
    props = batched_decode_proposals(
        jax.lax.stop_gradient(rpn_cls),
        jax.lax.stop_gradient(rpn_regr),
        valid_fw,
        valid_fh,
        scales=tuple(config.anchor_box_scales),
        ratios=tuple(tuple(r) for r in config.anchor_box_ratios),
        stride=config.rpn_stride,
        std_scaling=config.std_scaling,
        pre_nms_top_n=config.pre_nms_top_n,
        post_nms_top_n=config.post_nms_top_n,
        nms_thresh=config.rpn_nms_thresh,
        anchors_xywh=feat_anchors,
    )

    pt_fn = functools.partial(
        proposal_targets,
        n_classes=config.n_classes,
        n_rois=config.n_rois,
        stride=config.rpn_stride,
        classifier_min_overlap=config.classifier_min_overlap,
        classifier_max_overlap=config.classifier_max_overlap,
        classifier_regr_std=tuple(config.classifier_regr_std),
    )
    pt = jax.vmap(pt_fn)(
        props.boxes,
        props.valid,
        batch["gt_boxes"],
        batch["gt_classes"],
        batch["gt_mask"],
        jax.random.split(rng_p, b),
    )
    roi_mask = pt.roi_valid.astype(jnp.float32) * sample_valid[:, None]
    return pt, roi_mask


def compute_losses(
    model: FasterRCNN,
    config: Config,
    params: Any,
    batch_stats: Any,
    batch: dict[str, jnp.ndarray],
    rng: jax.Array,
    deterministic: bool,
    anchors: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    trunk_frozen: bool = False,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Forward pass + all four losses for one batch of tiles.

    ``trunk_frozen``: the ENTIRE trunk is below the trainability cut
    (``base_net_trainable=False``, the reference's train.py default) - a
    ``stop_gradient`` on the feature map then removes the whole trunk
    backward pass from the compiled step (the optimizer mask alone only
    zeroes the already-computed updates unless XLA happens to DCE them)."""
    images = _augment_and_preprocess(config, batch["image"], rng, deterministic)
    variables = {"params": params, "batch_stats": batch_stats}
    num_anchors = config.n_anchors
    sample_valid = batch["sample_valid"].astype(jnp.float32)
    img_anchors, feat_anchors = anchors if anchors is not None else (None, None)

    rng_t, rng_p, rng_d = jax.random.split(rng, 3)

    y_rpn_cls, y_rpn_regr = _batch_rpn_targets(
        config, batch, rng_t, img_anchors, sample_valid
    )

    # ------------------------------------------------------------------ #
    # Shared trunk once; both stages reuse ``fmap``.
    # ------------------------------------------------------------------ #
    fmap = model.apply(variables, images, method=FasterRCNN.features)
    if trunk_frozen:
        fmap = jax.lax.stop_gradient(fmap)
    rpn_cls, rpn_regr = model.apply(variables, fmap, method=FasterRCNN.rpn)

    l_rpn_cls = losses.rpn_loss_cls(y_rpn_cls, rpn_cls, num_anchors)
    l_rpn_regr = losses.rpn_loss_regr(y_rpn_regr, rpn_regr, num_anchors)

    pt, roi_mask = _proposals_and_roi_targets(
        config, rpn_cls, rpn_regr, batch, rng_p, feat_anchors, sample_valid
    )

    det_cls, det_regr = model.apply(
        variables,
        fmap,
        pt.rois,
        method=FasterRCNN.roi_heads,
        deterministic=deterministic,
        rngs=None if deterministic else {"dropout": rng_d},
    )
    l_det_cls = losses.class_loss_cls(pt.y_class, det_cls, roi_mask)
    l_det_regr = losses.class_loss_regr(
        pt.y_regr, det_regr, config.n_classes - 1, roi_mask
    )
    acc = losses.detector_accuracy(pt.y_class, det_cls, roi_mask)

    total = l_rpn_cls + l_rpn_regr + l_det_cls + l_det_regr
    n_valid = jnp.maximum(jnp.sum(sample_valid), 1.0)
    metrics = {
        "loss_rpn_cls": l_rpn_cls,
        "loss_rpn_regr": l_rpn_regr,
        "loss_detector_cls": l_det_cls,
        "loss_detector_regr": l_det_regr,
        "total_loss": total,
        "detector_acc": acc,
        # "mean number of bounding boxes from RPN overlapping GT boxes"
        # (train.py:383-384,448): positive RoIs per image before sampling.
        "mean_overlapping_bboxes": jnp.sum(
            pt.n_pos.astype(jnp.float32) * sample_valid
        )
        / n_valid,
    }
    return total, metrics


def _device_anchors(config: Config):
    """Anchor grids as device arrays, to be passed as jit *arguments*.

    Inlining them as HLO constants both bloats the serialized module (the
    axon remote-compile transport caps request size) and, for committed
    arrays, forces a device fetch at lowering time.
    """
    from radnet_tpu.ops.anchors import feature_anchors_xywh, image_anchors_xyxy

    f = config.feat_size
    scales = tuple(config.anchor_box_scales)
    ratios = tuple(tuple(r) for r in config.anchor_box_ratios)
    img = jax.device_put(image_anchors_xyxy(f, f, scales, ratios, config.rpn_stride))
    feat = jax.device_put(feature_anchors_xywh(f, f, scales, ratios, config.rpn_stride))
    return img, feat


def make_train_step(
    model: FasterRCNN,
    config: Config,
    trunk_trainable: bool | None = None,
    donate: bool = False,
) -> Callable:
    """Build the jitted fused train step.

    ``trunk_trainable`` must match the trainability the optimizer was
    built with (``create_train_state``'s ``base_net_trainable``); default
    is ``config.base_net_trainable``.  When the trunk is fully frozen the
    step skips its backward pass entirely (see ``compute_losses``).

    ``donate``: donate the input state's buffers so params + Adam moments
    (~1.4 GB for the VGG16 head) update in place - measured 38.6 ->
    26.8 ms/step (1.44x) on v5e-1.  The production drivers enable it; the
    default stays False because a donated state is INVALID after the call
    (callers that re-read the pre-step state - tests, notebooks - would
    break, and ``fit`` must snapshot the state before handing it to the
    async checkpointer, see engine/loop.py)."""
    if trunk_trainable is None:
        trunk_trainable = config.base_net_trainable
    anchors = _device_anchors(config)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, rng, anchors):
        def loss_fn(params):
            return compute_losses(
                model, config, params, state.batch_stats, batch, rng, False,
                anchors=anchors, trunk_frozen=not trunk_trainable,
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    fn = lambda state, batch, rng: train_step(state, batch, rng, anchors)
    # Exposed for profiling/benchmarks: lower()/compile() for
    # cost_analysis-based MFU needs the underlying jit + the anchor arg.
    fn._jitted = train_step
    fn._anchors = anchors
    fn._donates = donate  # engine/loop.py snapshots before async saves
    return fn


def make_alternating_train_step(
    model: FasterRCNN,
    config: Config,
    trunk_trainable: bool | None = None,
    donate: bool = False,
) -> Callable:
    """The reference's EXACT alternating schedule as one fused program.

    Reproduces /root/reference/train.py:288-402 for controlled comparisons:

      1. RPN update: rpn losses -> grads -> Adam #1 on (trunk + rpn)
         (``model_rpn.train_on_batch``, train.py:288);
      2. proposals from the JUST-UPDATED params
         (``model_rpn.predict_on_batch``, train.py:291) -> rpn_to_roi ->
         calc_iou -> balanced RoI sampling;
      3. detector update: detector losses -> grads -> Adam #2 on
         (trunk + head) (``model_classifier.train_on_batch``, train.py:393).

    The state must come from ``create_train_state(..,
    schedule="alternating")``: ``state.tx == (tx_rpn, tx_det)`` and
    ``state.opt_state == {"rpn": .., "det": ..}``.  Where the reference
    pays 4 host<->device hops and 3 backbone passes per image, this is
    still ONE dispatch - but two trunk forward(+backward) passes per step
    vs the joint step's one, so expect roughly half the joint steps/s
    with a trainable trunk (measured number in BASELINE.md).
    """
    if trunk_trainable is None:
        trunk_trainable = config.base_net_trainable
    anchors = _device_anchors(config)
    num_anchors = config.n_anchors

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, rng, anchors):
        tx_rpn, tx_det = state.tx
        img_anchors, feat_anchors = anchors
        images = _augment_and_preprocess(config, batch["image"], rng, False)
        sample_valid = batch["sample_valid"].astype(jnp.float32)
        # Same split discipline as compute_losses: one target rng, one
        # proposal-sampling rng, one dropout rng per step.
        rng_t, rng_p, rng_d = jax.random.split(rng, 3)

        y_rpn_cls, y_rpn_regr = _batch_rpn_targets(
            config, batch, rng_t, img_anchors, sample_valid
        )

        # ---------------- phase 1: RPN update (train.py:288) ------------ #
        def rpn_loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            fmap = model.apply(variables, images, method=FasterRCNN.features)
            if not trunk_trainable:
                fmap = jax.lax.stop_gradient(fmap)
            rpn_cls, rpn_regr = model.apply(variables, fmap, method=FasterRCNN.rpn)
            l_cls = losses.rpn_loss_cls(y_rpn_cls, rpn_cls, num_anchors)
            l_regr = losses.rpn_loss_regr(y_rpn_regr, rpn_regr, num_anchors)
            return l_cls + l_regr, (l_cls, l_regr)

        (_, (l_rpn_cls, l_rpn_regr)), rpn_grads = jax.value_and_grad(
            rpn_loss_fn, has_aux=True
        )(state.params)
        rpn_updates, new_rpn_opt = tx_rpn.update(
            rpn_grads, state.opt_state["rpn"], state.params
        )
        params1 = optax.apply_updates(state.params, rpn_updates)

        # ------ phase 2: proposals from the UPDATED RPN (train.py:291) -- #
        variables1 = {"params": params1, "batch_stats": state.batch_stats}
        fmap1 = model.apply(variables1, images, method=FasterRCNN.features)
        rpn_cls1, rpn_regr1 = model.apply(variables1, fmap1, method=FasterRCNN.rpn)
        pt, roi_mask = _proposals_and_roi_targets(
            config, rpn_cls1, rpn_regr1, batch, rng_p, feat_anchors, sample_valid
        )

        # ------------ phase 3: detector update (train.py:393) ----------- #
        def det_loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            fmap = model.apply(variables, images, method=FasterRCNN.features)
            if not trunk_trainable:
                fmap = jax.lax.stop_gradient(fmap)
            det_cls, det_regr = model.apply(
                variables,
                fmap,
                pt.rois,
                method=FasterRCNN.roi_heads,
                deterministic=False,
                rngs={"dropout": rng_d},
            )
            l_cls = losses.class_loss_cls(pt.y_class, det_cls, roi_mask)
            l_regr = losses.class_loss_regr(
                pt.y_regr, det_regr, config.n_classes - 1, roi_mask
            )
            acc = losses.detector_accuracy(pt.y_class, det_cls, roi_mask)
            return l_cls + l_regr, (l_cls, l_regr, acc)

        (_, (l_det_cls, l_det_regr, acc)), det_grads = jax.value_and_grad(
            det_loss_fn, has_aux=True
        )(params1)
        det_updates, new_det_opt = tx_det.update(
            det_grads, state.opt_state["det"], params1
        )
        # Reference parity (train.py:389-402): when calc_iou finds NO
        # matching boxes the reference skips the detector train_on_batch
        # entirely.  An Adam step on all-zero grads still moves params
        # (moment decay), so gate BOTH the update and the Adam-state
        # advance on at least one valid RoI in the batch.
        has_valid = jnp.sum(roi_mask) > 0

        def _gate(new, old):
            return jnp.where(has_valid, new, old) if hasattr(new, "dtype") else new

        det_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(has_valid, u, jnp.zeros_like(u)), det_updates
        )
        new_det_opt = jax.tree_util.tree_map(
            _gate, new_det_opt, state.opt_state["det"]
        )
        params2 = optax.apply_updates(params1, det_updates)

        n_valid = jnp.maximum(jnp.sum(sample_valid), 1.0)
        total = l_rpn_cls + l_rpn_regr + l_det_cls + l_det_regr
        metrics = {
            "loss_rpn_cls": l_rpn_cls,
            "loss_rpn_regr": l_rpn_regr,
            "loss_detector_cls": l_det_cls,
            "loss_detector_regr": l_det_regr,
            "total_loss": total,
            "detector_acc": acc,
            "mean_overlapping_bboxes": jnp.sum(
                pt.n_pos.astype(jnp.float32) * sample_valid
            )
            / n_valid,
        }
        new_state = state.replace(
            step=state.step + 1,
            params=params2,
            opt_state={"rpn": new_rpn_opt, "det": new_det_opt},
        )
        return new_state, metrics

    fn = lambda state, batch, rng: train_step(state, batch, rng, anchors)
    fn._jitted = train_step
    fn._anchors = anchors
    fn._donates = donate
    return fn


def make_train_bundle(
    model: FasterRCNN,
    config: Config,
    n_steps: int,
    trunk_trainable: bool | None = None,
    donate: bool = False,
) -> Callable:
    """Fuse ``n_steps`` optimizer steps into ONE dispatched program.

    ``lax.scan`` over ``n_steps`` stacked batches: each host->device
    dispatch carries a fixed per-call latency (on the tunneled backend
    ~11 ms/step - measured 36.7 ms/step dispatched singly vs 25.4 ms/step
    inside a bundle, batch 8 VGG16 @608^2 on v5e-1; on directly-attached
    hosts the same overhead is smaller but nonzero), and bundling amortizes
    it across ``n_steps`` real updates.

    The training trajectory is IDENTICAL to ``n_steps`` single
    ``make_train_step`` calls: the scan body performs the same
    ``rng, sub = jax.random.split(rng)`` the training loop performs per
    step (engine/loop.py), so the RNG stream, batch order and arithmetic
    all match (pinned by tests/test_train_step.py).

    Returns ``fn(state, batches, rng) -> (new_state, new_rng, metrics)``
    where ``batches`` is a sequence of ``n_steps`` batch dicts and every
    metric comes back stacked with a leading ``n_steps`` axis.  ``donate``
    has the same contract as :func:`make_train_step` (the input state's
    buffers are consumed).
    """
    if trunk_trainable is None:
        trunk_trainable = config.base_net_trainable
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    anchors = _device_anchors(config)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_bundle(state: TrainState, batches, rng, anchors):
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

        def body(carry, batch):
            state, rng = carry
            rng, sub = jax.random.split(rng)

            def loss_fn(params):
                return compute_losses(
                    model, config, params, state.batch_stats, batch, sub,
                    False, anchors=anchors, trunk_frozen=not trunk_trainable,
                )

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return (state.apply_gradients(grads), rng), metrics

        (state, rng), metrics = jax.lax.scan(body, (state, rng), stacked)
        return state, rng, metrics

    fn = lambda state, batches, rng: train_bundle(state, tuple(batches), rng, anchors)
    fn._jitted = train_bundle
    fn._anchors = anchors
    fn._donates = donate
    fn._bundle_steps = n_steps
    return fn


def make_eval_step(model: FasterRCNN, config: Config) -> Callable:
    """Build the jitted eval step (losses only, no dropout, no update)."""
    anchors = _device_anchors(config)

    @jax.jit
    def eval_step(state: TrainState, batch, rng, anchors):
        _, metrics = compute_losses(
            model, config, state.params, state.batch_stats, batch, rng, True,
            anchors=anchors,
        )
        return metrics

    return lambda state, batch, rng: eval_step(state, batch, rng, anchors)
