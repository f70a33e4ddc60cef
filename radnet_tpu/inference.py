"""Inference engine: tiled panel prediction with an on-device cascade.

The serving counterpart of the reference's ``RADNet`` class
(/root/reference/faster_rcnn/RADNet.py:25-718), re-architected for TPU:

Reference flow (per tile, host-driven): format -> ``model_rpn.predict`` ->
numpy ``rpn_to_roi`` -> ~15x ``model_detector.predict`` chunks of 20 RoIs
-> numpy per-class NMS -> python coordinate lift (RADNet.py:543-604).  That
is ~16 host<->device round-trips per tile and thousands per panel.

Here: all tiles of a panel are resized onto the fixed canvas on the host,
then processed in fixed-size *batches* by ONE jitted program
(:meth:`RADNet._predict_tiles`): backbone + RPN + proposal decode/NMS +
RoI heads over all 300 proposals at once + per-class detection NMS, all on
device.  Only the final tiny per-panel merge (cluster-average NMS across
tiles, RADNet.py:156-240, and the cross-image-type merge, :698-702) runs
on host, on at most a few hundred boxes.

Output contract matches the reference ``predict``: a list of
``{'class', 'prob', 'x1', 'y1', 'x2', 'y2'}`` dicts in panel coordinates
(RADNet.py:705-718).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from radnet_tpu.config import Config
from radnet_tpu.data.dataset import get_image
from radnet_tpu.data.pipeline import (
    preprocess_on_device,
    resize_to_canvas,
    s2d_canvas_np,
)
from radnet_tpu.data.tiling import plan_tiles
from radnet_tpu.engine.steps import feature_extent
from radnet_tpu.geometry import decode_boxes
from radnet_tpu.models.detector import FasterRCNN, build_model
from radnet_tpu.ops.nms import final_nms_cluster, nms_fixed_point, nms_numpy
from radnet_tpu.ops.proposals import batched_decode_proposals


class RADNet:
    """Rock-art detector: tiled panels -> merged detections."""

    def __init__(
        self,
        config: Config,
        model: FasterRCNN,
        params: Any,
        batch_stats: Any,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh``; when given, tile
        batches shard over the mesh's ``data`` axis (each chip processes
        its slice of the tiles) and the detector head is tensor-sharded
        over the ``model`` axis (the same Megatron column/row split
        training uses - parallel/mesh.py); everything else is replicated
        and XLA inserts the collectives.  The effective tile batch
        (``self.tile_batch``) is bumped to a multiple of the data-axis
        size if needed - the caller's Config is never mutated."""
        self.C = config
        self.model = model
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.class_mapping = config.inv_class_mapping
        self.bbox_threshold = config.bbox_threshold  # RADNet.py:36
        self.mesh = mesh
        self._batch_sharding = None
        self._dp = 1
        self.tile_batch = config.infer_tile_batch
        if mesh is not None:
            from radnet_tpu.parallel.mesh import batch_sharding, make_param_shardings

            dp = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
            self._dp = dp
            if config.infer_tile_batch % dp:
                self.tile_batch = -(-config.infer_tile_batch // dp) * dp
                print(
                    f"infer_tile_batch={config.infer_tile_batch} not divisible "
                    f"by data-parallel size {dp}; using {self.tile_batch}"
                )
            self.variables = jax.device_put(
                self.variables,
                make_param_shardings(self.variables, mesh, warn_label="serving"),
            )
            self._batch_sharding = batch_sharding(mesh)
        # Anchors + params enter the jitted program as arguments, never as
        # inlined HLO constants (keeps the lowered module small for the
        # remote-compile transport and avoids lowering-time device fetches).
        from radnet_tpu.ops.anchors import feature_anchors_xywh

        f = config.feat_size
        anchors_np = feature_anchors_xywh(
            f, f,
            tuple(config.anchor_box_scales),
            tuple(tuple(r) for r in config.anchor_box_ratios),
            config.rpn_stride,
        )
        if mesh is not None:
            from radnet_tpu.parallel.mesh import replicated

            self._feat_anchors = jax.device_put(anchors_np, replicated(mesh))
        else:
            self._feat_anchors = jax.device_put(anchors_np)
        # Per-canvas-bucket anchor grids for non-square windows (the
        # shortest-side path); keyed by (canvas_h, canvas_w).
        self._anchor_cache: dict[tuple[int, int], Any] = {}
        # Host-s2d stem path (resnet50): the square-canvas host tile path
        # ships space-to-depth'd uint8 canvases so the device program
        # never touches the channel-minor (B, S, S, 3) layout (the
        # trunk's worst stage - BASELINE.md r4).  The centering map
        # (mean masked to the canvas region; the pad ring stays zero)
        # enters the jit as an ARGUMENT (CLAUDE.md pitfall #10).
        self._use_host_s2d = (
            config.network == "resnet50"
            and getattr(config, "infer_host_s2d", True)
        )
        if self._use_host_s2d:
            from radnet_tpu.data.pipeline import s2d_mean_offsets

            mean_np = s2d_mean_offsets(config.canvas_size)
            if mesh is not None:
                from radnet_tpu.parallel.mesh import replicated

                self._s2d_mean = jax.device_put(mean_np, replicated(mesh))
            else:
                self._s2d_mean = jax.device_put(mean_np)
        else:
            self._s2d_mean = None
        self._predict_tiles_jit = jax.jit(self._predict_tiles_impl)

    def _predict_tiles(self, images, valid_wh, feat_anchors=None):
        if self._batch_sharding is not None:
            images = jax.device_put(images, self._batch_sharding)
            valid_wh = jax.device_put(valid_wh, self._batch_sharding)
        return self._predict_tiles_jit(
            self.variables,
            images,
            valid_wh,
            self._feat_anchors if feat_anchors is None else feat_anchors,
            self._s2d_mean if images.shape[-1] == 12 else None,
        )

    # ------------------------------------------------------------------ #
    # Shortest-side resize support: rectangular canvas buckets for
    # non-square windows (see Config.infer_shortest_side).
    # ------------------------------------------------------------------ #
    def _canvas_for_window(self, w: int, h: int) -> tuple[int, int]:
        """Canvas bucket (H, W) for a ``w x h`` window under the
        shortest-side rule; square windows use the standard canvas."""
        cfg = self.C
        cs = cfg.canvas_size
        if w == h or not cfg.infer_shortest_side:
            return (cs, cs)
        from radnet_tpu.data.pipeline import shortest_side_dims

        nw, nh = shortest_side_dims(w, h, cfg.img_size)
        mult_w = max(1, min(cfg.infer_canvas_max_mult, -(-nw // cs)))
        mult_h = max(1, min(cfg.infer_canvas_max_mult, -(-nh // cs)))
        return (cs * mult_h, cs * mult_w)

    def _anchors_for_canvas(self, canvas_hw: tuple[int, int]):
        cfg = self.C
        if canvas_hw == (cfg.canvas_size, cfg.canvas_size):
            return self._feat_anchors
        a = self._anchor_cache.get(canvas_hw)
        if a is None:
            from radnet_tpu.config import backbone_feat_size
            from radnet_tpu.ops.anchors import feature_anchors_xywh

            grid = feature_anchors_xywh(
                backbone_feat_size(cfg.network, canvas_hw[0]),
                backbone_feat_size(cfg.network, canvas_hw[1]),
                tuple(cfg.anchor_box_scales),
                tuple(tuple(r) for r in cfg.anchor_box_ratios),
                cfg.rpn_stride,
            )
            if self.mesh is not None:
                from radnet_tpu.parallel.mesh import replicated

                a = jax.device_put(grid, replicated(self.mesh))
            else:
                a = jax.device_put(grid)
            self._anchor_cache[canvas_hw] = a
        return a

    def _rect_window_batches(self, img: np.ndarray, tiles: np.ndarray, canvas_hw):
        """Like :meth:`_tile_batches` but with the reference's
        shortest-side resize onto a rectangular canvas bucket.  Batches pad
        only to the data-axis multiple (these windows are rare - one
        full-image pseudo-tile per panel, or a handful of sub-tile-panel
        windows - so dead-tile padding, not program reuse, dominates)."""
        from radnet_tpu.data.pipeline import resize_to_canvas_shortest

        cfg = self.C
        ch, cw = canvas_hw
        n_all = len(tiles)
        pos = 0
        while pos < n_all:
            n = min(self.tile_batch, n_all - pos)
            bs = -(-n // self._dp) * self._dp
            chunk = tiles[pos : pos + n]
            imgs = np.zeros((bs, ch, cw, 3), np.uint8)
            wh = np.full((bs, 2), float(cfg.img_size), np.float32)
            scales = np.ones((bs,), np.float64)
            for i, tile in enumerate(chunk):
                tile_img = img[tile[1] : tile[3], tile[0] : tile[2], :]
                canvas, scale, vw, vh = resize_to_canvas_shortest(
                    tile_img, cfg.img_size, canvas_hw
                )
                imgs[i] = canvas
                wh[i] = (vw, vh)
                scales[i] = scale
            yield imgs, wh, scales, chunk, n
            pos += n

    # ------------------------------------------------------------------ #
    # Device-side tiling: the panel ships to HBM once; each call slices a
    # batch of tile windows, resizes them, and runs the cascade without any
    # host-side cropping/resizing or per-tile transfers.  Interior windows
    # of the reference tiling are always exactly tile_size^2
    # (utils.py:352-368 edge-snaps rather than shrinks), so the program is
    # fixed-shape; panels smaller than a tile fall back to the host path.
    # ------------------------------------------------------------------ #
    @functools.cached_property
    def _predict_panel_tiles_jit(self):
        cfg = self.C
        ts = cfg.tile_size
        s = cfg.canvas_size
        out = cfg.img_size

        def impl(variables, panel, origins, feat_anchors):
            from radnet_tpu.ops.resize import resize_bicubic

            def one(origin):
                tile = jax.lax.dynamic_slice(
                    panel, (origin[1], origin[0], 0), (ts, ts, 3)
                )
                # MXU-matmul bicubic (cv2.INTER_CUBIC family) instead of
                # gather-based jax.image.resize - see ops/resize.py.  The
                # panel source is uint8: saturate + round like cv2's
                # uint8 output does, or cubic overshoot at hard edges
                # (up to ~+-25 intensity at the panel/zero-background
                # boundary of every edge tile) diverges from the host
                # tile path after mean-centering.
                resized = jnp.rint(
                    jnp.clip(resize_bicubic(tile, out, out), 0.0, 255.0)
                )
                canvas = jnp.zeros((s, s, 3), jnp.float32)
                return jax.lax.dynamic_update_slice(canvas, resized, (0, 0, 0))

            from radnet_tpu.data.pipeline import IMAGENET_BGR_MEAN

            images = jax.vmap(one)(origins)
            images = images - jnp.asarray(IMAGENET_BGR_MEAN, jnp.float32)
            valid_wh = jnp.full((origins.shape[0], 2), float(out), jnp.float32)
            # skip the uint8 branch of _predict_tiles_impl: images are
            # already preprocessed float32
            return self._predict_tiles_impl(variables, images, valid_wh, feat_anchors)

        return jax.jit(impl)

    # ------------------------------------------------------------------ #
    # Prescaled device tiling: every tile of the uniform tiling gets
    # resized by the SAME factor img_size/tile_size, so the panel can be
    # downscaled once on the host (cv2 bicubic, the host tile path's own
    # resampler) and shipped small - img_size^2/tile_size^2 of the full
    # panel's bytes (9% at the reference 600/2000 geometry).  The device
    # program then just slices ready-sized windows: no per-tile resize at
    # all.  This is the default because the host<->device link is the
    # scarce resource (CLAUDE.md pitfall #1); `infer_panel_prescale=False`
    # keeps the full-resolution panel + MXU-bicubic path for hosts where
    # CPU, not bandwidth, is the bottleneck.
    # ------------------------------------------------------------------ #
    @functools.cached_property
    def _predict_prescaled_tiles_jit(self):
        cfg = self.C
        s = cfg.canvas_size
        out = cfg.img_size

        def impl(variables, panel_small, origins, feat_anchors):
            grey = panel_small.ndim == 2  # single-channel shipping

            def one(origin):
                if grey:
                    tile = jax.lax.dynamic_slice(
                        panel_small, (origin[1], origin[0]), (out, out)
                    )
                    tile = jnp.broadcast_to(tile[..., None], (out, out, 3))
                else:
                    tile = jax.lax.dynamic_slice(
                        panel_small, (origin[1], origin[0], 0), (out, out, 3)
                    )
                canvas = jnp.zeros((s, s, 3), tile.dtype)
                return jax.lax.dynamic_update_slice(canvas, tile, (0, 0, 0))

            images = jax.vmap(one)(origins)
            valid_wh = jnp.full((origins.shape[0], 2), float(out), jnp.float32)
            # uint8 canvases: preprocess_on_device mean-centers under jit.
            return self._predict_tiles_impl(variables, images, valid_wh, feat_anchors)

        return jax.jit(impl)

    @staticmethod
    def _grey_channel(img: np.ndarray) -> np.ndarray | None:
        """The single channel of a grey 3-channel panel, else None.

        Rock-art panels are greyscale topographic visualizations stored as
        3 identical channels (the ``enhanced_topo_grey`` image types);
        shipping one channel and broadcasting on device cuts host resize
        work and host->device bytes by 3x.  The full equality check (~30 ms
        on a 16 MPx panel) guards correctness for genuinely-colored inputs.
        """
        if img.ndim != 3 or img.shape[2] != 3:
            return None
        c0 = img[..., 0]
        if np.array_equal(c0, img[..., 1]) and np.array_equal(c0, img[..., 2]):
            return np.ascontiguousarray(c0)
        return None

    def _panel_bucket_pad(self, img: np.ndarray, bucket: int = 512) -> np.ndarray:
        """Pad panel dims up to a bucket multiple so distinct panels reuse
        the compiled program (windows never touch the padding)."""
        h, w = img.shape[:2]
        hb = -(-h // bucket) * bucket
        wb = -(-w // bucket) * bucket
        if (hb, wb) == (h, w):
            return img
        padded = np.zeros((hb, wb) + img.shape[2:], img.dtype)
        padded[:h, :w] = img
        return padded

    # ------------------------------------------------------------------ #
    # Device-side cascade for one batch of tiles.
    # ------------------------------------------------------------------ #
    def _predict_tiles_impl(
        self, variables, images: jnp.ndarray, valid_wh: jnp.ndarray, feat_anchors,
        s2d_mean=None,
    ):
        """(T, S, S, 3) tiles - or (T, (S+6)/2, (S+6)/2, 12) host-s2d
        tiles with their centering map ``s2d_mean`` - to per-class
        detections.

        Returns (boxes (T, K, D, 4) in resized-image px, scores (T, K, D),
        valid (T, K, D)) with K = n_classes - 1 foreground classes and
        D = ``max_detections_per_tile``.
        """
        cfg = self.C
        scales = tuple(cfg.anchor_box_scales)
        ratios = tuple(tuple(r) for r in cfg.anchor_box_ratios)

        if images.shape[-1] == 12:
            # host-built stem s2d (uint8) - centering (mean masked to the
            # canvas region) folded into one subtract; bit-equal to
            # center + pad + device-s2d on the (S, S, 3) canvas.
            images = images.astype(jnp.float32) - s2d_mean
            fmap = self.model.apply(
                variables, images, method=FasterRCNN.features, prebuilt_s2d=True
            )
        else:
            images = preprocess_on_device(images)
            fmap = self.model.apply(variables, images, method=FasterRCNN.features)
        rpn_cls, rpn_regr = self.model.apply(variables, fmap, method=FasterRCNN.rpn)

        valid_fw = feature_extent(valid_wh[:, 0], cfg.network)
        valid_fh = feature_extent(valid_wh[:, 1], cfg.network)
        props = batched_decode_proposals(
            rpn_cls,
            rpn_regr,
            valid_fw,
            valid_fh,
            scales=scales,
            ratios=ratios,
            stride=cfg.rpn_stride,
            std_scaling=cfg.std_scaling,
            pre_nms_top_n=cfg.pre_nms_top_n,
            post_nms_top_n=cfg.post_nms_top_n,
            nms_thresh=cfg.rpn_nms_thresh,  # RADNet.py:556-561
            anchors_xywh=feat_anchors,
        )

        # Optional head budget: proposals leave NMS score-descending, so
        # truncating to the top max_head_rois is bit-identical to the full
        # cascade whenever a tile has that many or fewer surviving
        # proposals, and degrades to top-K-by-objectness otherwise.  The
        # RoI head carries ~87% of cascade FLOPs at 300 RoIs/tile
        # (scripts/profile_cascade.py), so sparse-scene serving can halve
        # latency here.  None = reference parity (all post_nms_top_n).
        prop_boxes, prop_valid = props.boxes, props.valid
        if cfg.max_head_rois and cfg.max_head_rois < prop_boxes.shape[1]:
            prop_boxes = prop_boxes[:, : cfg.max_head_rois]
            prop_valid = prop_valid[:, : cfg.max_head_rois]

        # xyxy -> xywh (RADNet.py:564-565); all proposals through the RoI
        # head at once (the reference chunks into groups of 20, :109-124).
        x1, y1, x2, y2 = (prop_boxes[..., i] for i in range(4))
        rois = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
        det_cls, det_regr = self.model.apply(
            variables, fmap, rois, method=FasterRCNN.roi_heads, deterministic=True
        )

        # Per-RoI selection (RADNet.py:127-152): confidence cut, drop bg.
        n_fg = cfg.n_classes - 1
        best_prob = jnp.max(det_cls, axis=-1)  # (T, R)
        best_cls = jnp.argmax(det_cls, axis=-1)  # (T, R)
        keep = prop_valid & (best_prob >= self.bbox_threshold) & (best_cls != cfg.bg_class_id)

        # Class-specific regression decode, std un-scaled (RADNet.py:140-147).
        t, r = det_regr.shape[:2]
        deltas_by_class = det_regr.reshape(t, r, n_fg, 4)
        cls_idx = jnp.minimum(best_cls, n_fg - 1)
        deltas = jnp.take_along_axis(
            deltas_by_class, cls_idx[..., None, None], axis=2
        )[:, :, 0, :]
        std = jnp.asarray(cfg.classifier_regr_std, jnp.float32)
        decoded = decode_boxes(rois, deltas / std, round_outputs=True)
        dx, dy, dw, dh = (decoded[..., i] for i in range(4))
        boxes = cfg.rpn_stride * jnp.stack([dx, dy, dx + dw, dy + dh], axis=-1)

        # Per-tile per-class NMS @0.2 on device (RADNet.py:570-574).
        def one_tile(tile_boxes, tile_probs, tile_cls, tile_keep):
            def one_class(c):
                v = tile_keep & (tile_cls == c)
                return nms_fixed_point(
                    tile_boxes,
                    tile_probs,
                    v,
                    cfg.detection_nms_thresh,
                    max_out=cfg.max_detections_per_tile,
                )

            return jax.vmap(one_class)(jnp.arange(n_fg))

        out_boxes, out_scores, out_valid = jax.vmap(one_tile)(
            boxes, best_prob, best_cls, keep
        )
        return out_boxes, out_scores, out_valid

    # ------------------------------------------------------------------ #
    # Host-side panel orchestration.
    # ------------------------------------------------------------------ #
    def _batch_schedule(self, n: int) -> list[tuple[int, int]]:
        """(start, batch_size) pairs covering ``n`` tiles with less padding.

        Every compiled cascade program is fixed-shape per batch size, so a
        36-tile panel at ``infer_tile_batch=8`` pads its tail batch with 4
        dead tiles - ~10% of panel device time (measured 157.8 vs 175.4
        ms/panel device-side, batch sweep 2026-08-17; ms/tile is flat in
        batch size).  When the remainder fits in ``bs//2``, the tail
        dispatches through a half-size program instead: one extra cached
        compile buys the padding back.  On a mesh both sizes must stay
        divisible by the data-axis size; the half program is skipped when
        it is not.
        """
        bs = self.tile_batch
        schedule = [(s, bs) for s in range(0, (n // bs) * bs, bs)]
        rem = n - (n // bs) * bs
        if rem:
            half = bs // 2
            if (
                not self.C.infer_tail_subbatch
                or rem > half
                or half == 0
                or (self.mesh is not None and half % self._dp)
            ):
                half = bs
            schedule.append(((n // bs) * bs, half))
        return schedule

    def _tile_batches(self, img: np.ndarray, tiles: np.ndarray):
        """Yield (images, valid_wh, scales, tile_origins) fixed-size batches."""
        cfg = self.C
        s2d = self._use_host_s2d
        h2 = (cfg.canvas_size + 6) // 2
        for start, bs in self._batch_schedule(len(tiles)):
            chunk = tiles[start : start + bs]
            # uint8 canvases: mean-centering runs on device, so each tile
            # ships 1 byte/channel instead of 4 over the host->device
            # link.  For resnet50 the canvases ship SPACE-TO-DEPTH'd
            # (same bytes, (H2, H2, 12) layout): the device program then
            # never touches the channel-minor (S, S, 3) layout that makes
            # the stem its worst stage (data/pipeline.py::s2d_canvas_np).
            if s2d:
                imgs = np.zeros((bs, h2, h2, 12), np.uint8)
            else:
                imgs = np.zeros((bs, cfg.canvas_size, cfg.canvas_size, 3), np.uint8)
            wh = np.full((bs, 2), float(cfg.canvas_size), np.float32)
            scales = np.ones((bs,), np.float64)
            n = len(chunk)
            for i, tile in enumerate(chunk):
                tile_img = img[tile[1] : tile[3], tile[0] : tile[2], :]
                canvas, scale, vw, vh = resize_to_canvas(
                    tile_img, cfg.img_size, cfg.canvas_size
                )
                imgs[i] = s2d_canvas_np(canvas) if s2d else canvas
                wh[i] = (vw, vh)
                scales[i] = scale
            yield imgs, wh, scales, chunk, n

    def predict(self, images: Sequence[np.ndarray]) -> list[dict[str, Any]]:
        """Full multi-tile, multi-image-type prediction (RADNet.py:502-718)."""
        return self.predict_collect(self.predict_dispatch(images))

    def warmup(self, img: np.ndarray) -> None:
        """Compile every tile-batch program size serving can hit.

        A plain predict compiles only the program sizes THIS panel's
        schedule selects (a 4-tile panel at ``infer_tile_batch=8``
        compiles just the half program; a 16-tile panel just the full
        one), but a serving warmup promises the first REAL panel pays no
        compile (cli/serve.py --warmup-size) and real panels need not
        match the warmup tile count.  So after the predict, any uncovered
        size in {full batch, eligible half batch} is force-compiled by
        dispatching that many copies of the first tile window.

        Two program keys warmup can NOT cover for geometries it was not
        shown: the prescaled panel's bucketed shape and its grey/color
        channel rank (the default device-tiling path is keyed on both) -
        pass a warmup panel per production panel size, and one grey plus
        one color variant when serving mixes them (cli/serve.py warms
        both).
        """
        self.predict([img])
        cfg = self.C
        if cfg.max_n_tiles_train <= 0:
            return
        tiles = plan_tiles(img.shape[1], img.shape[0], cfg.tile_size, cfg.tile_overlap)
        if len(tiles) == 0:
            return  # panel smaller than a tile: host fallback, compiled above
        covered = {bs for _, bs in self._batch_schedule(len(tiles))}
        want = {self.tile_batch}
        half = self.tile_batch // 2
        if (
            cfg.infer_tail_subbatch
            and half > 0
            and not (self.mesh is not None and half % self._dp)
        ):
            want.add(half)
        for bs in sorted(want - covered, reverse=True):
            pending: list = []
            self._dispatch_tiles(img, np.repeat(tiles[:1], bs, axis=0), pending)
            self._drain_tiles(pending, {}, {})

    def predict_dispatch(self, images: Sequence[np.ndarray]) -> list[list]:
        """Dispatch every image's tile batches to the device (async).

        Dispatch ALL images' tile batches before draining any: jax
        execution is async, so host-side prep of image k+1 (grey detect,
        cv2 prescale, canvas building) overlaps device compute of image k
        - the multi-image-type cascade (RADNet.py:502-506 runs the whole
        pipeline once per type) pipelines instead of serializing.  The same
        split lets a serving loop dispatch panel k+1 before collecting
        panel k (see cli/serve.py).
        """
        cfg = self.C
        per_image_pending = []
        for img in images:
            pending: list = []
            if cfg.max_n_tiles_train > 0:
                tiles = plan_tiles(
                    img.shape[1], img.shape[0], cfg.tile_size, cfg.tile_overlap
                )
                self._dispatch_tiles(img, tiles, pending)

            if cfg.include_full_img:
                full_tile = np.array(
                    [[0, 0, img.shape[1], img.shape[0]]], dtype=np.int64
                )
                self._dispatch_tiles(img, full_tile, pending)
            per_image_pending.append(pending)
        return per_image_pending

    def predict_collect(self, per_image_pending: list[list]) -> list[dict[str, Any]]:
        """Drain dispatched tile batches and run the host-side merges."""
        cfg = self.C
        all_bbox: dict[str, list] = {}
        all_probs: dict[str, list] = {}

        for pending in per_image_pending:
            bbox_total: dict[str, list] = {}
            probs_total: dict[str, list] = {}
            self._drain_tiles(pending, bbox_total, probs_total)

            # Cross-tile cluster-average NMS per class (RADNet.py:670-678).
            for key in bbox_total:
                nb, np_ = final_nms_cluster(
                    np.array(bbox_total[key]),
                    np.array(probs_total[key]),
                    obj_avg_threshold=0.2,
                    obj_confidence_threshold=0.8,
                    n_obj_avg=5,
                )
                for j in range(len(nb)):
                    all_bbox.setdefault(key, []).append(nb[j].tolist())
                    all_probs.setdefault(key, []).append(float(np_[j]))

        # Cross-image-type merge at IoU 0.4 (RADNet.py:695-702).
        detections: list[dict[str, Any]] = []
        for key in all_bbox:
            nb, np_ = nms_numpy(
                np.array(all_bbox[key]),
                np.array(all_probs[key]),
                overlap_thresh=cfg.cross_type_nms_thresh,
            )
            for j in range(nb.shape[0]):
                x1, y1, x2, y2 = nb[j]
                detections.append(
                    {
                        "class": key,
                        "prob": float(np_[j]),
                        "x1": int(x1),
                        "y1": int(y1),
                        "x2": int(x2),
                        "y2": int(y2),
                    }
                )
        return detections

    def _dispatch_tiles(self, img, tiles, pending: list) -> None:
        """Dispatch every tile batch of one image (appending to ``pending``).

        jax execution is async, so transfers and compute of batch k+1
        overlap with batch k (the reference blocks on the device ~16x per
        tile, RADNet.py:543-604); results are collected by
        :meth:`_drain_tiles`.
        """
        cfg = self.C
        ts = cfg.tile_size
        # The fixed-shape device program slices exactly tile_size^2 windows,
        # so it only applies when EVERY window has that extent (plan_tiles
        # windows always do - they edge-snap rather than shrink).  The
        # include_full_img pseudo-tile [0,0,W,H] is arbitrary-shaped and must
        # go through the host path, which resizes the whole window
        # (the reference's full-image pass resizes the entire panel,
        # RADNet.py:606-665).
        uniform_windows = bool(
            len(tiles) > 0
            and (tiles[:, 2] - tiles[:, 0] == ts).all()
            and (tiles[:, 3] - tiles[:, 1] == ts).all()
        )
        device_tiling = (
            cfg.infer_device_tiling
            and uniform_windows
            and img.shape[0] >= ts
            and img.shape[1] >= ts
        )
        prescale = device_tiling and cfg.infer_panel_prescale and cfg.img_size < ts
        if prescale:
            # Downscale the whole panel ONCE by the uniform per-tile resize
            # factor and ship the small panel; the device slices ready-sized
            # img_size^2 windows.  Numerically this matches the host tile
            # path except in the ~4 px bicubic support band at interior tile
            # edges, where the global resize sees true neighbouring pixels
            # (the per-tile resize clamps) - compare detection sets with
            # tolerance, not bit-exactly.
            import cv2

            scale = float(cfg.img_size) / ts
            sw = max(cfg.img_size, int(round(img.shape[1] * scale)))
            sh = max(cfg.img_size, int(round(img.shape[0] * scale)))
            grey = self._grey_channel(img)
            small = cv2.resize(
                grey if grey is not None else img,
                (sw, sh),
                interpolation=cv2.INTER_CUBIC,
            )
            small = self._panel_bucket_pad(small, bucket=128)
            if self._batch_sharding is not None:
                from radnet_tpu.parallel.mesh import replicated

                panel_dev = jax.device_put(small, replicated(self.mesh))
            else:
                panel_dev = jax.device_put(small)
            for start, bs in self._batch_schedule(len(tiles)):
                chunk = tiles[start : start + bs]
                slice_xy = np.round(chunk[:, :2] * scale).astype(np.int64)
                slice_xy[:, 0] = np.clip(slice_xy[:, 0], 0, sw - cfg.img_size)
                slice_xy[:, 1] = np.clip(slice_xy[:, 1], 0, sh - cfg.img_size)
                origins = np.zeros((bs, 2), np.int32)
                origins[: len(chunk)] = slice_xy
                origins_dev = jnp.asarray(origins)
                if self._batch_sharding is not None:
                    origins_dev = jax.device_put(origins_dev, self._batch_sharding)
                out = self._predict_prescaled_tiles_jit(
                    self.variables, panel_dev, origins_dev, self._feat_anchors
                )
                # Effective panel-space origins of the (rounded) slices, so
                # the standard coordinate lift stays exact to <1 panel px.
                chunk_eff = np.array(chunk, copy=True)
                chunk_eff[:, 0] = np.round(slice_xy[:, 0] / scale)
                chunk_eff[:, 1] = np.round(slice_xy[:, 1] / scale)
                pending.append((out, np.full(bs, scale), chunk_eff, len(chunk)))
        elif device_tiling:
            # Ship the panel once; slice + resize + cascade on device.  On a
            # mesh the panel is replicated and the origin batch shards over
            # the data axis, so each chip runs its slice of the tile batch.
            if self._batch_sharding is not None:
                from radnet_tpu.parallel.mesh import replicated

                panel_dev = jax.device_put(
                    self._panel_bucket_pad(img), replicated(self.mesh)
                )
            else:
                panel_dev = jax.device_put(self._panel_bucket_pad(img))
            ratio = float(cfg.img_size) / ts
            for start, bs in self._batch_schedule(len(tiles)):
                chunk = tiles[start : start + bs]
                origins = np.zeros((bs, 2), np.int32)
                origins[: len(chunk)] = chunk[:, :2]
                origins_dev = jnp.asarray(origins)
                if self._batch_sharding is not None:
                    origins_dev = jax.device_put(origins_dev, self._batch_sharding)
                out = self._predict_panel_tiles_jit(
                    self.variables, panel_dev, origins_dev, self._feat_anchors
                )
                pending.append((out, np.full(bs, ratio), chunk, len(chunk)))
        elif cfg.infer_shortest_side and len(tiles) > 0 and not bool(
            ((tiles[:, 2] - tiles[:, 0]) == (tiles[:, 3] - tiles[:, 1])).all()
        ):
            # Non-square windows (the include_full_img pseudo-tile,
            # sub-tile panels): the reference resizes the SHORTEST side to
            # img_size (get_new_img_size, utils.py:65-75).  Group windows
            # by canvas bucket; each bucket is one cached compiled program
            # with its own anchor grid.
            order = [
                self._canvas_for_window(int(t[2] - t[0]), int(t[3] - t[1]))
                for t in tiles
            ]
            groups: dict[tuple[int, int], list[int]] = {}
            for i, key in enumerate(order):
                groups.setdefault(key, []).append(i)
            for canvas_hw, idx in groups.items():
                anchors = self._anchors_for_canvas(canvas_hw)
                for imgs, wh, scales, chunk, n in self._rect_window_batches(
                    img, tiles[np.asarray(idx)], canvas_hw
                ):
                    out = self._predict_tiles(
                        jnp.asarray(imgs), jnp.asarray(wh), anchors
                    )
                    pending.append((out, scales, chunk, n))
        else:
            for imgs, wh, scales, chunk, n in self._tile_batches(img, tiles):
                out = self._predict_tiles(jnp.asarray(imgs), jnp.asarray(wh))
                pending.append((out, scales, chunk, n))

    def _drain_tiles(self, pending: list, bbox_total, probs_total) -> None:
        """Collect dispatched tile-batch results in order."""
        cfg = self.C
        n_fg = cfg.n_classes - 1
        for out, scales, chunk, n in pending:
            boxes, scores, valid = jax.device_get(out)
            for i in range(n):
                tile = chunk[i]
                ratio = scales[i]
                for c in range(n_fg):
                    v = valid[i, c]
                    if not v.any():
                        continue
                    cls_name = self.class_mapping[c]
                    for b, p in zip(boxes[i, c][v], scores[i, c][v]):
                        # get_real_coordinates (RADNet.py:44-51): floor
                        # division by the resize ratio.
                        rx1, ry1, rx2, ry2 = (int(v0 // ratio) for v0 in b)
                        if rx2 <= rx1 or ry2 <= ry1:
                            continue
                        bbox_total.setdefault(cls_name, []).append(
                            [tile[0] + rx1, tile[1] + ry1, tile[0] + rx2, tile[1] + ry2]
                        )
                        probs_total.setdefault(cls_name, []).append(float(p))

    def predict_from_path(self, img_path: str) -> list[dict[str, Any]]:
        """Load one image per configured type and predict (RADNet.py:482-500)."""
        images = []
        if self.C.use_img_type:
            for img_type in self.C.img_types:
                images.append(get_image(img_path, [img_type], random_type=False))
        else:
            images.append(get_image(img_path, self.C.img_types, random_type=False))
        return self.predict(images)

    # ------------------------------------------------------------------ #
    # RPN-only debug path (RADNet.py:310-480, minus the matplotlib debug
    # blocks in the hot loop and the undefined-get_map crash - see
    # SURVEY.md §7 "known bugs to NOT replicate").
    # ------------------------------------------------------------------ #
    def predict_region_proposals(self, img: np.ndarray) -> list[dict[str, Any]]:
        cfg = self.C
        out: list[dict[str, Any]] = []
        tiles = plan_tiles(img.shape[1], img.shape[0], cfg.tile_size, cfg.tile_overlap)
        for imgs, wh, scales, chunk, n in self._tile_batches(img, tiles):
            props = jax.device_get(
                self._proposals_only(
                    self.variables, jnp.asarray(imgs), jnp.asarray(wh), self._feat_anchors
                )
            )
            for i in range(n):
                tile = chunk[i]
                ratio = scales[i]
                boxes = props[0][i][props[2][i]] * cfg.rpn_stride  # fm -> px (RADNet.py:381)
                for b in boxes:
                    rx1, ry1, rx2, ry2 = (int(v // ratio) for v in b)
                    out.append(
                        {
                            "class": "object",
                            "prob": 1.0,
                            "x1": tile[0] + rx1,
                            "y1": tile[1] + ry1,
                            "x2": tile[0] + rx2,
                            "y2": tile[1] + ry2,
                        }
                    )
        return out

    @functools.cached_property
    def _proposals_only(self):
        cfg = self.C
        model = self.model

        @jax.jit
        def fn(variables, images, valid_wh, feat_anchors):
            images = preprocess_on_device(images)
            fmap = model.apply(variables, images, method=FasterRCNN.features)
            rpn_cls, rpn_regr = model.apply(variables, fmap, method=FasterRCNN.rpn)
            return batched_decode_proposals(
                rpn_cls,
                rpn_regr,
                feature_extent(valid_wh[:, 0], cfg.network),
                feature_extent(valid_wh[:, 1], cfg.network),
                scales=tuple(cfg.anchor_box_scales),
                ratios=tuple(tuple(r) for r in cfg.anchor_box_ratios),
                stride=cfg.rpn_stride,
                std_scaling=cfg.std_scaling,
                pre_nms_top_n=cfg.pre_nms_top_n,
                post_nms_top_n=cfg.post_nms_top_n,
                nms_thresh=cfg.rpn_nms_thresh,
                anchors_xywh=feat_anchors,
            )

        return fn


def load_radnet(model_dir: str, mesh=None, quantize: str | None = None) -> RADNet:
    """Build a RADNet from a trained model directory (config.json +
    ckpt_best/ checkpoint) - the ``load_radnet`` factory (RADNet.py:721-775),
    minus the pickle trust.  ``mesh``: optional multi-chip serving mesh
    (see :class:`RADNet`).  ``quantize``: serving-time override of
    ``config.infer_quantize`` ("int8" runs the RoI head on the MXU's int8
    path; checkpoints are unaffected - models/quant.py)."""
    import jax.random as jrandom

    from radnet_tpu.engine.checkpoint import restore_checkpoint
    from radnet_tpu.engine.train_state import create_train_state

    config = Config.load(os.path.join(model_dir, "config.json"))
    if quantize is not None:
        config.infer_quantize = quantize or None  # "" clears a saved value
    model = build_model(config)
    template = create_train_state(model, config, jrandom.PRNGKey(0))
    from radnet_tpu.engine.checkpoint import _resolve_checkpoint_path

    ckpt_path = _resolve_checkpoint_path(os.path.join(model_dir, "ckpt_best"))
    if not os.path.isdir(ckpt_path):
        ckpt_path = os.path.join(model_dir, "ckpt_last")
    state, _ = restore_checkpoint(ckpt_path, template)
    return RADNet(config, model, state.params, state.batch_stats, mesh=mesh)
