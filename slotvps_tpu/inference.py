"""Per-frame / per-video inference pipeline.

Equivalent of the reference's test loop (reference tools/test_vpq.py:23-59
``single_gpu_test`` + mmdet/models/detectors/vps_temporal_slots.py:207-469
``simple_test``), restructured TPU-first:

  * the whole device step (backbone -> decoder -> postproc) is one jitted
    function with static shapes; no per-frame GPU<->CPU ping-pong
    (the reference crosses the device boundary 4+ times per frame,
    SURVEY.md §3.3),
  * each frame's backbone features are computed once and carried as the
    next frame's reference features (the reference recomputes them),
  * only the tiny greedy id-assignment runs on host (tracking.py).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from slotvps_tpu.config import Config
from slotvps_tpu.models.detector import (
    FrameFeatures, FrameOutputs, decode_pair, extract_features)
from slotvps_tpu.models.postprocess import PostprocResult, postprocess_frame
from slotvps_tpu.models.track_head import apply_track_head
from slotvps_tpu.tracking import TrackState


def _device_normalize(img: jnp.ndarray, dcfg, valid_hw=None) -> jnp.ndarray:
    """Deferred test-time normalization for uint8 uploads.

    The host pipeline can ship padded uint8 BGR frames
    (data/pipeline.preprocess ``keep_uint8``) — 4x fewer bytes over the
    host->device link than normalized f32 — and this applies the exact
    same BGR->RGB + ``(x - mean) / std`` affine on device (reference
    Normalize, configs/cityscapes/r50_fpn_slotvps.py:122-123).  The dtype
    branch is trace-time static: float inputs pass through untouched.

    ``valid_hw`` = the un-padded (img_h, img_w): the reference pads AFTER
    normalizing, so /32 pad rows/cols must be zero in normalized space —
    pass ``meta['img_shape']`` whenever it differs from the padded shape
    (the VIPER 1080->1088 case; full-res Cityscapes needs no padding)."""
    if img.dtype != jnp.uint8:
        return img
    x = img[..., ::-1] if dcfg.to_rgb else img
    x = x.astype(jnp.float32)
    x = (x - jnp.asarray(dcfg.mean, jnp.float32)) \
        / jnp.asarray(dcfg.std, jnp.float32)
    if valid_hw is not None and tuple(valid_hw) != x.shape[1:3]:
        h, w = valid_hw
        rows = jnp.arange(x.shape[1]) < h
        cols = jnp.arange(x.shape[2]) < w
        x = jnp.where((rows[:, None] & cols[None, :])[None, :, :, None],
                      x, 0.0)
    return x


def _compact_post(post: PostprocResult) -> PostprocResult:
    """Shrink the per-frame result for the device->host hop: the panoptic /
    semantic maps are uint8-valued by construction (stuff 0..10, things
    11+rank with rank < proposal_num <= 127, void 255 — FrameResult stores
    them as uint8 anyway), but postprocess_frame computes them in int32.
    Casting on-device cuts readback bytes 4x — the eval CLI is readback-
    bound on links much slower than a local PCIe (e.g. this dev
    environment's tunneled TPU moves ~18 MB/s)."""
    return post._replace(panoptic=post.panoptic.astype(jnp.uint8),
                         sseg=post.sseg.astype(jnp.uint8))


class FrameResult(NamedTuple):
    """Host-side per-frame result, reference ``pano_results`` dict
    (vps_temporal_slots.py:459-465)."""

    sseg: np.ndarray        # [H, W] uint8 semantic argmax ('fcn_outputs')
    panoptic: np.ndarray    # [H, W] uint8 fused map ('panoptic_outputs')
    cls_inds: np.ndarray    # [n_things] 1-based thing class
    cls_prob: np.ndarray    # [n_things] scores
    obj_ids: np.ndarray     # [n_things] track ids


class InferencePipeline:
    """Streaming per-frame inference with carried video state."""

    def __init__(self, params: Dict, config: Config,
                 image_size: Optional[tuple] = None,
                 valid_hw: Optional[tuple] = None):
        """``image_size`` = (ori_h, ori_w) target output size; when it
        differs from the processed (padded) size, masks/semantic logits
        are resized to it on-device (reference
        vps_temporal_slots.py:313-316, :440-451 — the VIPER 1080p path).
        ``valid_hw`` = un-padded (img_h, img_w) for uint8 uploads (see
        :func:`_device_normalize`)."""
        self.params = params
        self.config = config
        self.image_size = image_size
        cfg = config.model

        @jax.jit
        def _extract(params, img):
            return extract_features(params, cfg, _device_normalize(
                img, config.data, valid_hw))

        @jax.jit
        def _decode_post(params, ref_feats, cur_feats):
            outs = decode_pair(params, cfg, ref_feats, cur_feats)
            out_size = self.image_size or (4 * outs.pred_masks.shape[2],
                                           4 * outs.pred_masks.shape[3])
            post = postprocess_frame(
                outs.pred_logits[0], outs.pred_masks[0], outs.embeddings[0],
                outs.fcn_output[0], tuple(out_size), cfg.postprocess)
            return _compact_post(post)

        @jax.jit
        def _match(params, cur_emb, prev_emb):
            return apply_track_head(params["track_head"], cur_emb, prev_emb)

        self._extract = _extract
        self._decode_post = _decode_post
        self._match = _match
        self._track = TrackState()
        self._prev_feats: Optional[FrameFeatures] = None
        self.stuff_num = cfg.stuff_num

    def reset_video(self):
        self._track.reset()
        self._prev_feats = None

    def process_frame(self, img: np.ndarray, is_first: bool,
                      ref_img: Optional[np.ndarray] = None) -> FrameResult:
        """img: [1, H, W, 3] normalized.  ``is_first`` starts a new video
        (reference fid==1 check, vps_temporal_slots.py:227-236).

        ``ref_img`` forces explicit reference-frame pixels (first frame of a
        test span refs itself — reference cityscapes_vps.py:258-264);
        otherwise the previous frame's cached features are used.
        """
        if is_first:
            self.reset_video()

        cur_feats = self._extract(self.params, jnp.asarray(img))
        if self._prev_feats is not None:
            ref_feats = self._prev_feats
        elif ref_img is not None:
            ref_feats = self._extract(self.params, jnp.asarray(ref_img))
        else:
            ref_feats = cur_feats
        post: PostprocResult = self._decode_post(self.params, ref_feats,
                                                 cur_feats)
        self._prev_feats = cur_feats
        return self._finish_frame(post, is_first)

    def _finish_frame(self, post: PostprocResult,
                      is_first: bool) -> FrameResult:
        return finish_frame(post, is_first, self._track,
                            lambda cur, prev: self._match(
                                self.params, cur, prev),
                            self.stuff_num)


def finish_frame(post: PostprocResult, is_first: bool, track: TrackState,
                 match_fn, stuff_num: int) -> FrameResult:
    """Host-side per-frame assembly: variable-length lists + greedy id
    assignment against ``track``'s pool (reference ``pano_results`` dict +
    tracking update, vps_temporal_slots.py:332-409, :459-465).

    ``match_fn(cur_emb, prev_emb)`` runs the track head on device."""
    kept = np.asarray(post.kept)
    is_thing = np.asarray(post.is_thing)
    labels = np.asarray(post.labels)
    scores = np.asarray(post.scores)
    embeds = np.asarray(post.embeddings)

    kept_idx = np.nonzero(kept)[0]
    kept_thing = kept & is_thing
    thing_idx = np.nonzero(kept_thing)[0]

    cls_inds = labels[thing_idx] - (stuff_num - 1)
    cls_prob = scores[thing_idx]

    cur_emb = embeds[kept_idx]
    if is_first or track.embeddings is None:
        all_ids = track.start(cur_emb)
    elif len(kept_idx) == 0:
        all_ids = np.zeros((0,), np.int64)
    else:
        match = np.asarray(match_fn(jnp.asarray(cur_emb),
                                    jnp.asarray(track.embeddings)))
        all_ids = track.update(match, cur_emb)
    # export thing ids only (reference :338-339, :408-409)
    thing_pos_in_kept = np.searchsorted(kept_idx, thing_idx)
    obj_ids = all_ids[thing_pos_in_kept] if len(all_ids) else \
        np.zeros((0,), np.int64)

    return FrameResult(
        sseg=np.asarray(post.sseg).astype(np.uint8),
        panoptic=np.asarray(post.panoptic).astype(np.uint8),
        cls_inds=cls_inds.astype(np.int64),
        cls_prob=cls_prob.astype(np.float32),
        obj_ids=obj_ids.astype(np.int64),
    )


def run_video(pipeline: InferencePipeline,
              frames: Sequence[np.ndarray]) -> List[FrameResult]:
    """Run one video clip (list of [1, H, W, 3] normalized frames)."""
    results = []
    for t, img in enumerate(frames):
        results.append(pipeline.process_frame(img, is_first=(t == 0)))
    return results


class BatchedVideoPipeline:
    """Lockstep batched multi-video inference (BASELINE config 5).

    Processes frame t of ``batch`` videos in ONE device step — the exact
    configuration ``bench.py`` measures — and shards the video axis over a
    ``jax.sharding.Mesh`` when more than one device is visible.  Reference
    analog: round-robin dataset index sharding over GPUs + pickle gather
    (reference mmdet/core/evaluation/eval_hooks.py:40-79); here the video
    batch axis IS the shard axis, each device keeps its own videos
    end-to-end (``shard_map``), and no collective ever moves image data.

    Videos must share a length (the eval datasets' ``nframes_span_test``
    spans guarantee this) and a frame shape.  Tracking stays on host with
    one :class:`TrackState` per video — bit-identical to the streaming
    :class:`InferencePipeline` per video.
    """

    def __init__(self, params: Dict, config: Config, batch: int,
                 image_size: Optional[tuple] = None,
                 devices: Optional[Sequence] = None,
                 valid_hw: Optional[tuple] = None):
        self.params = params
        self.config = config
        self.batch = batch
        self.stuff_num = config.model.stuff_num
        cfg = config.model

        if devices is None:
            devices = jax.devices()
        # largest divisor of `batch` that fits the visible devices: each
        # device gets an equal, statically-shaped slice of the video axis
        ndev = max(d for d in range(1, len(devices) + 1) if batch % d == 0)
        self.n_devices = ndev
        lb = batch // ndev

        def _extract_local(params, imgs):
            return extract_features(params, cfg, _device_normalize(
                imgs, config.data, valid_hw))

        def _decode_post_local(params, ref_feats, cur_feats):
            outs = decode_pair(params, cfg, ref_feats, cur_feats)
            out_size = image_size or (4 * outs.pred_masks.shape[2],
                                      4 * outs.pred_masks.shape[3])
            # per-video postproc loop (measured faster than vmap: lockstep
            # while_loops + a serialized (B, K) claim grid — see bench.py)
            posts = [_compact_post(postprocess_frame(
                outs.pred_logits[i], outs.pred_masks[i],
                outs.embeddings[i], outs.fcn_output[i], tuple(out_size),
                cfg.postprocess)) for i in range(lb)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *posts)

        self._img_sharding = None
        if ndev > 1:
            from jax.sharding import (Mesh, NamedSharding,
                                      PartitionSpec as P)

            mesh = Mesh(np.array(devices[:ndev]), ("video",))
            # upload each device's video slice directly to its shard
            self._img_sharding = NamedSharding(mesh, P("video"))
            # check_vma=False: postproc's scan/while_loop carries start
            # from unvarying constants, which trips the varying-manual-axes
            # checker even though the computation is purely per-shard
            self._extract_b = jax.jit(jax.shard_map(
                _extract_local, mesh=mesh,
                in_specs=(P(), P("video")), out_specs=P("video"),
                check_vma=False))
            self._decode_post_b = jax.jit(jax.shard_map(
                _decode_post_local, mesh=mesh,
                in_specs=(P(), P("video"), P("video")),
                out_specs=P("video"), check_vma=False))
        else:
            self._extract_b = jax.jit(_extract_local)
            self._decode_post_b = jax.jit(_decode_post_local)

        @jax.jit
        def _match(params, cur_emb, prev_emb):
            return apply_track_head(params["track_head"], cur_emb, prev_emb)

        self._match = _match

    def run_videos(self, videos: Sequence[Sequence[np.ndarray]]
                   ) -> List[List[FrameResult]]:
        """videos: ``batch`` clips, each a list of [1, H, W, 3] normalized
        frames of equal length.  Returns one FrameResult list per video."""
        assert len(videos) == self.batch, (len(videos), self.batch)
        t_len = len(videos[0])
        assert all(len(v) == t_len for v in videos), \
            "all videos in a batch must share a length"
        tracks = [TrackState() for _ in range(self.batch)]
        results: List[List[FrameResult]] = [[] for _ in range(self.batch)]

        def drain(posts):
            """Read back one step's stacked results + run host tracking.
            Called AFTER the next step is dispatched: jax dispatch is
            async, so the (readback-bound on slow links) device->host copy
            of step t-1 overlaps step t's device compute."""
            host = jax.tree.map(np.asarray, posts)
            is_first = len(results[0]) == 0
            for v in range(self.batch):
                post_v = jax.tree.map(lambda x: x[v], host)
                results[v].append(finish_frame(
                    post_v, is_first, tracks[v],
                    lambda cur, prev: self._match(self.params, cur, prev),
                    self.stuff_num))

        def put(t):
            # async host->device upload (device_put returns immediately):
            # issued right after step t-1's dispatch so the copy rides
            # under the device compute
            return jax.device_put(
                np.concatenate([v[t] for v in videos], axis=0),
                self._img_sharding)

        ref_feats = None
        pending = None
        imgs = put(0)
        for t in range(t_len):
            cur_feats = self._extract_b(self.params, imgs)
            posts = self._decode_post_b(
                self.params, cur_feats if t == 0 else ref_feats, cur_feats)
            if t + 1 < t_len:
                imgs = put(t + 1)
            ref_feats = cur_feats
            if pending is not None:
                drain(pending)
            pending = posts
        drain(pending)
        return results


def _warn_pool_saturation(ids: np.ndarray, pool_capacity: int) -> None:
    """Track ids >= capacity were assigned but their embeddings dropped
    (tracking_jax.update_pool mode="drop"): later frames can never re-match
    those tracks, diverging from the unbounded host loop — say so."""
    if ids.size and int(ids.max()) >= pool_capacity:
        import warnings
        warnings.warn(
            f"VideoScanner track pool saturated: max id {int(ids.max())} "
            f">= pool_capacity {pool_capacity}; tracks past capacity "
            "cannot be re-matched (raise pool_capacity or use the "
            "streaming InferencePipeline)", RuntimeWarning)


class VideoScanner:
    """Whole-clip inference as ONE jitted ``lax.scan`` over frames.

    The reference dispatches each frame from python and crosses the device
    boundary 4+ times per frame (SURVEY §3.3); InferencePipeline removes
    the crossings but still dispatches per frame.  Here the per-frame
    recurrence (carried reference features + track pool) is a scan carry,
    tracking runs on device (tracking_jax.py), and the host gets one
    stacked readback per clip (SURVEY §7 step 6 / BASELINE config 2).
    """

    def __init__(self, params: Dict, config: Config,
                 image_size: Optional[tuple] = None,
                 pool_capacity: int = 256,
                 valid_hw: Optional[tuple] = None):
        self.params = params
        self.config = config
        self.stuff_num = config.model.stuff_num
        cfg = config.model

        def step(carry, img):
            from slotvps_tpu.tracking_jax import track_step

            prev_feats, pool, params_c = carry
            cur_feats = extract_features(params_c, cfg, _device_normalize(
                img, config.data, valid_hw))
            outs = decode_pair(params_c, cfg, prev_feats, cur_feats)
            out_size = image_size or (4 * outs.pred_masks.shape[2],
                                      4 * outs.pred_masks.shape[3])
            post = postprocess_frame(
                outs.pred_logits[0], outs.pred_masks[0],
                outs.embeddings[0], outs.fcn_output[0], tuple(out_size),
                cfg.postprocess)
            match = apply_track_head(params_c["track_head"],
                                     post.embeddings, pool.embeddings)
            ids, pool = track_step(pool, match, post.embeddings, post.kept)
            out = (post.kept, post.is_thing, post.labels, post.scores,
                   post.panoptic, post.sseg, ids)
            return (cur_feats, pool, params_c), out

        @functools.partial(jax.jit, static_argnums=2)
        def run(params_j, frames, pool_capacity):
            from slotvps_tpu.tracking_jax import init_pool

            first = extract_features(params_j, cfg, _device_normalize(
                frames[0], config.data, valid_hw))
            pool = init_pool(pool_capacity,
                             params_j["init_mask_query"].shape[-1])
            (_, pool, _), outs = jax.lax.scan(
                step, (first, pool, params_j), frames)
            return outs

        self._run = run
        self._pool_capacity = pool_capacity

    def run_video(self, frames: Sequence[np.ndarray]) -> List[FrameResult]:
        """frames: list of [1, H, W, 3] normalized arrays (one video)."""
        stacked = jnp.asarray(np.stack(frames))
        kept, is_thing, labels, scores, panoptic, sseg, ids = [
            np.asarray(x)
            for x in self._run(self.params, stacked, self._pool_capacity)]
        _warn_pool_saturation(ids, self._pool_capacity)
        results = []
        for t in range(len(frames)):
            thing = kept[t] & is_thing[t]
            idx = np.nonzero(thing)[0]
            results.append(FrameResult(
                sseg=sseg[t].astype(np.uint8),
                panoptic=panoptic[t].astype(np.uint8),
                cls_inds=(labels[t][idx]
                          - (self.stuff_num - 1)).astype(np.int64),
                cls_prob=scores[t][idx].astype(np.float32),
                obj_ids=ids[t][idx].astype(np.int64),
            ))
        return results
