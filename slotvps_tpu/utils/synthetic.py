"""Synthetic multi-object scenes + flagship overfit training.

Used to measure/test the pipeline in a *trained-model* regime on hosts
with no real dataset: a scene of colored things on a layered stuff
background is rendered at any resolution, the flagship model is overfit
on it for a few hundred steps, and the resulting weights produce
confident, well-separated detections — the score/mask statistics a
production checkpoint has (scores saturate far from the keep threshold,
per-pixel slot margins are wide), unlike doctored random weights whose
calibration (utils/calibration.py) deliberately packs scores at the
threshold.

Consumers: utils/parity.tuned_vs_exact(regime="trained") and the
train->eval integration artifacts.  Reference analog: the reference is
always evaluated with trained checkpoints (tools/test_vpq.py loads
--checkpoint); this module is how we reach that regime without one.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Tuple

import numpy as np

# Cityscapes 19-class ids: stuff 0..10, things 11..18
_STUFF_LAYERS = (
    (10, 0.00, 0.25, (70, 130, 180)),   # sky
    (2, 0.25, 0.55, (70, 70, 70)),      # building
    (0, 0.55, 1.00, (128, 64, 128)),    # road
)
_THING_CLASSES = (11, 12, 13, 14, 15, 16, 17, 18)

# the data pipeline's normalization (data/pipeline.py; reference
# img_norm_cfg) — images render as BGR uint8 like cv2.imread output
_MEAN = np.asarray((123.675, 116.28, 103.53), np.float32)
_STD = np.asarray((58.395, 57.12, 57.375), np.float32)


class Scene(NamedTuple):
    img: np.ndarray        # [H, W, 3] uint8 (BGR)
    masks: np.ndarray      # [G, H, W] uint8 — thing masks then stuff masks
    labels: np.ndarray     # [G] int32
    is_thing: np.ndarray   # [G] bool
    semantic: np.ndarray   # [H, W] uint8 (19-class ids)


def norm_img(img: np.ndarray) -> np.ndarray:
    """BGR uint8 -> normalized RGB float32 [1, H, W, 3] (the exact
    transform of data/pipeline.preprocess)."""
    return ((img[..., ::-1].astype(np.float32) - _MEAN) / _STD)[None]


def make_scene(h: int, w: int, n_things: int = 12, seed: int = 0) -> Scene:
    """Render a layered stuff background + ``n_things`` colored ellipses
    placed on a jittered grid (non-overlapping by construction)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    semantic = np.zeros((h, w), np.uint8)
    stuff_masks = []
    for cls, top, bot, color in _STUFF_LAYERS:
        m = np.zeros((h, w), np.uint8)
        m[int(top * h):int(bot * h)] = 1
        img[m > 0] = color
        semantic[m > 0] = cls
        stuff_masks.append(m)

    cols = int(np.ceil(np.sqrt(n_things * w / h)))
    rows = int(np.ceil(n_things / cols))
    ch, cw = h // rows, w // cols
    yy, xx = np.mgrid[0:h, 0:w]
    thing_masks, thing_labels = [], []
    for i in range(n_things):
        r, c = divmod(i, cols)
        ry = ch * 0.18 * rng.uniform(0.7, 1.3)
        rx = cw * 0.22 * rng.uniform(0.7, 1.3)
        cy = r * ch + ch / 2 + rng.uniform(-0.12, 0.12) * ch
        cx = c * cw + cw / 2 + rng.uniform(-0.12, 0.12) * cw
        m = ((((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0) \
            .astype(np.uint8)
        cls = _THING_CLASSES[i % len(_THING_CLASSES)]
        # distinct saturated color per instance
        hue = (i * 360 / n_things) % 360
        color = _hsv_bgr(hue, 0.85, 0.9)
        img[m > 0] = color
        semantic[m > 0] = cls
        thing_masks.append(m)
        thing_labels.append(cls)
    # stuff masks exclude thing pixels (panoptic semantics)
    things_any = np.clip(sum(thing_masks), 0, 1).astype(np.uint8)
    stuff_masks = [m * (1 - things_any) for m in stuff_masks]

    masks = np.stack(thing_masks + stuff_masks)
    labels = np.asarray(thing_labels + [c for c, *_ in _STUFF_LAYERS],
                        np.int32)
    is_thing = np.asarray([True] * n_things + [False] * len(stuff_masks))
    return Scene(img, masks, labels, is_thing, semantic)


def _hsv_bgr(hue: float, s: float, v: float) -> Tuple[int, int, int]:
    c = v * s
    x = c * (1 - abs((hue / 60.0) % 2 - 1))
    m = v - c
    r, g, b = [(c, x, 0), (x, c, 0), (0, c, x),
               (0, x, c), (x, 0, c), (c, 0, x)][int(hue // 60) % 6]
    return (int((b + m) * 255), int((g + m) * 255), int((r + m) * 255))


def scene_frames(scene: Scene, n_frames: int, shift: int = 16
                 ) -> List[np.ndarray]:
    """Video of the scene translating ``shift`` px/frame (wrap-around) —
    normalized [1, H, W, 3] frames ready for extract_features."""
    return [norm_img(np.roll(scene.img, t * shift, axis=1))
            for t in range(n_frames)]


def scene_train_batch(scene: Scene, shift: int = 16, g_cap: int = 20):
    """TrainBatch for one (frame, ref) pair of the translating scene.

    GT masks/semantic at quarter resolution (TrainBatch contract);
    ``gt_pids`` = 1-based identity for things (the ref frame holds the
    same objects), 0 (new/none) for stuff, matching the reference's
    track-target grammar (cityscapes_vps.py:246-248)."""
    import jax.numpy as jnp

    from slotvps_tpu.training.step import make_train_batch

    h, w = scene.img.shape[:2]
    g = len(scene.labels)
    assert g <= g_cap, (g, g_cap)
    q = lambda m: m[::4, ::4].astype(np.float32)

    ref_img = np.roll(scene.img, -shift, axis=1)
    gt_masks = np.zeros((1, g_cap, h // 4, w // 4), np.float32)
    ref_masks = np.zeros((1, g_cap, h // 4, w // 4), np.float32)
    labels = np.zeros((1, g_cap), np.int32)
    valid = np.zeros((1, g_cap), bool)
    pids = np.zeros((1, g_cap), np.int32)
    for i in range(g):
        gt_masks[0, i] = q(scene.masks[i])
        ref_masks[0, i] = q(np.roll(scene.masks[i], -shift, axis=1))
        labels[0, i] = scene.labels[i]
        valid[0, i] = True
        if scene.is_thing[i]:
            pids[0, i] = i + 1
    semantic = scene.semantic[::4, ::4].astype(np.int32)[None]

    return make_train_batch(
        img=jnp.asarray(norm_img(scene.img)),
        ref_img=jnp.asarray(norm_img(ref_img)),
        gt_labels=jnp.asarray(labels), gt_masks=jnp.asarray(gt_masks),
        gt_valid=jnp.asarray(valid), gt_semantic=jnp.asarray(semantic),
        ref_gt_labels=jnp.asarray(labels),
        ref_gt_masks=jnp.asarray(ref_masks),
        ref_gt_valid=jnp.asarray(valid), gt_pids=jnp.asarray(pids))


def overfit(cfg_model, batch, steps: int = 300, lr: float = 2e-3,
            seed: int = 0, log_every: int = 0) -> Dict:
    """Overfit the model on one TrainBatch; returns trained params.

    ~300 steps pushes matched slots' class scores past the production
    0.85 keep threshold (the positive PQ term is dice-gated, so class
    confidence trails mask quality — same schedule as
    tests/test_train_eval_loop._train)."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from slotvps_tpu.models.detector import init_model
    from slotvps_tpu.training.step import train_step, trainable_mask

    params = init_model(jax.random.PRNGKey(seed), cfg_model)
    if cfg_model.backbone == "resnet":
        # random-init frozen BNs carry identity stats, which compound
        # activation magnitude ~1e22 across the flagship backbone and
        # poison the DCN offset heads (raw pre-GN features); calibrate
        # the running stats from one forward over the training pair —
        # the random-init analog of a pretrained checkpoint's stats
        # (models/resnet.calibrate_bn_stats).  Training then proceeds
        # with the reference's norm_eval=True frozen-stat semantics.
        from slotvps_tpu.models.resnet import calibrate_bn_stats

        both = jnp.concatenate([batch.ref_img, batch.img], axis=0)
        calibrate_bn_stats(params["backbone"], both,
                           depth=cfg_model.resnet.depth)
    opt = optax.masked(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr)),
        trainable_mask(params))
    opt_state = opt.init(params)
    step = jax.jit(functools.partial(train_step, cfg=cfg_model,
                                     optimizer=opt))
    for i in range(steps):
        params, opt_state, metrics = step(params, opt_state, batch)
        if log_every and (i == 0 or (i + 1) % log_every == 0):
            # step 1 is the compile fence — printing it separates "slow
            # compile" from "training stalled" when watching a log
            print(f"# overfit step {i + 1}/{steps} "
                  f"loss={float(metrics['loss_total']):.3f}", flush=True)
    return params
