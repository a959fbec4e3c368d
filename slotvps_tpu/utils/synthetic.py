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


_CAP_FREE = ("class_logits", "conv_pred", "reg_module", "track_head",
             # the whole slot decoder: LayerNorm-wrapped throughout, so
             # scale growth is function-invisible AND feeds no
             # un-normalized consumer (unlike FPN -> offset convs);
             # capping it starves per-slot class discrimination — all
             # 100 slots converged to one bias-driven 0.765 score.
             # conv_trans stays capped (feeds frozen-stat feat_bn).
             "slot_head']['stages")


def _norm_cap_fn(params, zero_cap: float = 0.007):
    """Per-step weight renormalization for the random-init overfit.

    With GroupNorm/LayerNorm after nearly every conv/linear, the loss is
    scale-invariant to most weights — AdamW's constant-magnitude updates
    then inflate them ~5-10%/step with nothing pushing back, and the
    growth compounds across depth into the un-normalized side paths
    (measured: FPN max 35 -> 2e14 in six steps; the loss-invisible,
    clamp-saturated DCN offset heads reach 1e20 px).  A pretrained
    checkpoint sits at a gradient equilibrium and never does this; for
    the from-scratch synthetic recipe we pin every >=2-D weight to its
    init Frobenius norm (direction still trains — a trust region), with
    two exceptions:

    * score/kernel-bearing heads stay free so confidences can saturate
      (``_CAP_FREE``: class logits, sseg predictor, dynamic-mask kernel
      generators, track embedder);
    * zero-init leaves (the DCN offset convs) get a small absolute cap
      (``zero_cap``) — enough to train real sub-pixel offsets, small
      enough that offsets stay within the production per-level halos:
      |offset| <= ||w_off|| * ||x_patch|| ~= zero_cap * rms_fpn *
      sqrt(9*C) — a step-count-independent hard bound (measured 2.04 px
      at P2 with cap 0.01; 0.007 leaves ~30% margin
      with the pinned FPN scale), inside the tightest production halo
      of 2 px.  The towers are level-shared (UPSNet quirk), so the cap
      cannot be set per level; it is sized for the finest.

    Returns a jitted ``params -> params``."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    flat, treedef = jtu.tree_flatten_with_path(params)
    caps = []
    for path, leaf in flat:
        k = jtu.keystr(path)
        if leaf.ndim < 2 or any(f in k for f in _CAP_FREE):
            caps.append(-1.0)  # uncapped sentinel (python float, static)
        else:
            n = float(jnp.linalg.norm(leaf))
            caps.append(n if n > 0.0 else zero_cap)
    caps = jtu.tree_unflatten(treedef, caps)

    def _cap(w, c):
        if c < 0.0:  # static python branch — caps are trace-time consts
            return w
        n = jnp.linalg.norm(w)
        return w * jnp.minimum(1.0, c / jnp.maximum(n, 1e-12))

    return jax.jit(lambda p: jax.tree.map(_cap, p, caps))


def _fpn_gain_fix(cfg_model, sample):
    """Per-step FPN output-scale pinning for the random-init overfit.

    Weight-norm caps alone cannot bound the forward gain: training
    aligns the (capped) conv kernels with their input directions, and an
    aligned conv amplifies by up to sqrt(fan_in) per layer — measured
    FPN maxima still reached ~2e3 after 12 capped steps.  Every FPN
    consumer is scale-invariant (GroupNorm/LayerNorm/frozen-BN right
    after) EXCEPT the semantic tower's block-0 DCN offset convs, which
    read the raw FPN output (reference deform_conv_with_offset.py) — so
    rescaling each level's final output conv (exactly linear in w, b)
    back to its init RMS on a calibration image is function-preserving
    where it must be and pins the one scale the offset heads see.

    Returns ``fix(params)`` (in-place); the first call records the init
    RMS per level."""
    import jax
    import jax.numpy as jnp

    from slotvps_tpu.models.detector import apply_backbone
    from slotvps_tpu.models.fpn import apply_fpn

    state = {}

    @jax.jit
    def measure(params):
        feats = apply_backbone(params, cfg_model, sample)
        outs = apply_fpn(params["fpn"], feats,
                         num_outs=cfg_model.fpn.num_outs)
        n = len(params["fpn"]["fpn"])
        return [jnp.sqrt(jnp.mean(jnp.square(
            outs[l].astype(jnp.float32)))) for l in range(n)]

    def fix(params):
        rms = [float(r) for r in measure(params)]
        if "init" not in state:
            state["init"] = rms
            return params
        for l, (r0, r) in enumerate(zip(state["init"], rms)):
            g = r0 / max(r, 1e-12)
            conv = params["fpn"]["fpn"][l]
            conv["w"] = conv["w"] * g
            if "b" in conv:
                conv["b"] = conv["b"] * g
        return params

    return fix


def _grouped_optimizer(params, lr: float, head_lr_mult: float,
                       decay_steps: int = 0):
    """make_optimizer split into two disjoint lr groups: the norm-capped
    trunk at ``lr`` and the ``_CAP_FREE`` score/kernel heads at
    ``head_lr_mult * lr``.  The caps pin trunk magnitudes, which also
    slows organic logit growth (the focal-prior class bias starts at
    -4.59 and the LN-normalized head inputs are O(1)), so the free heads
    need a faster schedule to saturate scores within a few hundred
    steps — standard per-group lr, applied only to this synthetic
    recipe (real training uses training.step.make_optimizer)."""
    import jax
    import jax.tree_util as jtu
    import optax

    from slotvps_tpu.training.step import trainable_mask

    tm = trainable_mask(params)
    flat, treedef = jtu.tree_flatten_with_path(tm)
    head = jtu.tree_unflatten(treedef, [
        t and any(f in jtu.keystr(p) for f in _CAP_FREE)
        for p, t in flat])
    trunk = jax.tree.map(lambda t, h: t and not h, tm, head)
    frozen = jax.tree.map(lambda t: not t, tm)

    def adamw(group_lr):
        if decay_steps:
            # cosine decay to 5%: the capped fixed-match overfit settles
            # into a collapse<->differentiation limit cycle at constant
            # lr (measured slot_std 0.0003 at step 140, 0.033 at 180);
            # decaying lr damps the cycle so the end state is stable
            group_lr = optax.cosine_decay_schedule(group_lr, decay_steps,
                                                   alpha=0.05)
        return optax.chain(optax.clip_by_global_norm(1.0),
                           optax.adamw(group_lr, weight_decay=1e-4))

    return optax.chain(
        optax.masked(adamw(lr), trunk),
        optax.masked(adamw(lr * head_lr_mult), head),
        optax.masked(optax.set_to_zero(), frozen))


def overfit(cfg_model, batch, steps: int = 300, lr: float = 2e-3,
            seed: int = 0, log_every: int = 0,
            head_lr_mult: float = 1.0, query_scale: float = 1.0) -> Dict:
    """Overfit the model on one TrainBatch; returns trained params.

    ~300 steps pushes matched slots' class scores past the production
    0.85 keep threshold (the positive PQ term is dice-gated, so class
    confidence trails mask quality — same schedule as
    tests/test_train_eval_loop._train)."""
    import functools

    import jax
    import jax.numpy as jnp

    from slotvps_tpu.models.detector import init_model
    from slotvps_tpu.training.step import train_step

    params = init_model(jax.random.PRNGKey(seed), cfg_model)
    recal = None
    if query_scale != 1.0:
        # Symmetry breaking: with magnitude-stabilized (calibrated/
        # capped) features the initial per-slot retrieval contrast is
        # tiny, Hungarian matching churns across near-identical slots,
        # every slot receives the same averaged target, and the decoder
        # collapses to one bit-identical slot (measured: all 100 slots
        # at score 0.705/class bg after 80 steps).  Scaling the learned
        # init queries sharpens the initial retrieval so slots lock onto
        # distinct regions and matching stabilizes — the synthetic
        # analog of a pretrained checkpoint's differentiated queries.
        params["init_mask_query"] = params["init_mask_query"] * query_scale
    if cfg_model.backbone == "resnet":
        # Random-init frozen BNs carry identity stats, which compound
        # activation magnitude ~1e22 across the flagship backbone and
        # poison the DCN offset heads (raw pre-GN features); calibrate
        # the running stats from one forward over the training pair —
        # the random-init analog of a pretrained checkpoint's stats
        # (models/resnet.calibrate_bn_stats).
        #
        # Recalibrate EVERY step (torch train-mode running-stats
        # analog), not just once: with stats frozen at init, the loss is
        # scale-invariant to the conv weights (GroupNorm downstream), so
        # AdamW's constant-fraction updates inflate them ~10%/step and
        # the growth compounds multiplicatively across ~50 layers —
        # measured FPN magnitudes 35 -> 2e14 in SIX steps, sending the
        # (loss-invisible, clamp-saturated) DCN offset heads to 1e20 px
        # while the GN-normalized losses still decrease.  Each train
        # step itself still sees frozen stats (the reference's
        # norm_eval=True semantics); the stats track between steps.
        from slotvps_tpu.models.resnet import calibrate_bn_stats

        both = jnp.concatenate([batch.ref_img, batch.img], axis=0)

        def recal(params, check=False):
            calibrate_bn_stats(params["backbone"], both,
                               depth=cfg_model.resnet.depth, check=check)

        recal(params, check=True)
    opt = _grouped_optimizer(params, lr, head_lr_mult, decay_steps=steps)
    opt_state = opt.init(params)
    step = jax.jit(functools.partial(train_step, cfg=cfg_model,
                                     optimizer=opt, fixed_match=True))
    renorm = _norm_cap_fn(params)
    fpn_fix = _fpn_gain_fix(cfg_model, batch.img)
    fpn_fix(params)  # record init per-level RMS

    # Best-checkpoint selection: even with lr decay the run passes
    # through differentiated and (partially) collapsed phases; keep the
    # params whose decoded slots best look like a production checkpoint
    # (many slots confidently (>0.85) predicting non-background classes,
    # high across-slot score spread).  Holding pytree refs is free —
    # arrays are immutable.
    from slotvps_tpu.models.detector import decode_pair, extract_features

    g_valid = int(np.asarray(batch.gt_valid).sum())

    @jax.jit
    def _sat_probe(p):
        f = extract_features(p, cfg_model, batch.img)
        o = decode_pair(p, cfg_model, f, f)
        sc = jax.nn.softmax(o.pred_logits[0].astype(jnp.float32), -1)
        smax = sc[:, :-1].max(-1)  # exclude the no-object class
        return (smax > 0.85).sum(), sc.std(axis=0).mean()

    best_score, best_params = -1.0, None
    for i in range(steps):
        params, opt_state, metrics = step(params, opt_state, batch)
        params = renorm(params)
        if recal is not None:
            recal(params)
        fpn_fix(params)
        if (i + 1) % 20 == 0 and (i + 1) >= min(100, steps):
            n_conf, std = _sat_probe(params)
            score = float(jnp.minimum(n_conf, g_valid)) + float(std)
            if score > best_score:
                best_score, best_params = score, params
                if log_every:
                    print(f"# overfit best @ step {i + 1}: "
                          f"{int(n_conf)} confident slots, "
                          f"slot-std {float(std):.4f}", flush=True)
        if log_every and (i == 0 or (i + 1) % log_every == 0):
            # step 1 is the compile fence — printing it separates "slow
            # compile" from "training stalled" when watching a log
            print(f"# overfit step {i + 1}/{steps} "
                  f"loss={float(metrics['loss_total']):.3f}", flush=True)
    return best_params if best_params is not None else params
