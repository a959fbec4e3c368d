"""Train -> eval integration (VERDICT r3 ask #6): a model trained on a
synthetic clip must produce eval-able artifacts whose VPQ rises
substantially over the random-init baseline — exercising the ONE path no
other test spans: training/ -> inference.InferencePipeline ->
eval.fusion.unify_pan_result -> inference_panoptic_video (pred.json +
pan_pred pngs) -> eval.vpq.final_eval (vpq-{k}.txt).

Reference analog: train_net + tools/test_vpq.py + tools/eval_vpq.py run
as separate stages on real data; here the whole loop closes on one
synthetic 6-frame static video (two things on a stuff background)."""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_training import _synthetic_frame, _tiny_model_cfg

H, W = 32, 64


def _full_cfg():
    from slotvps_tpu.config import named_config

    base = named_config("r50_fpn_slotvps")
    model = _tiny_model_cfg()
    # tiny frames: the production stuff_area_limit (2048 px) would erase
    # every stuff region of a 32x64 frame; scale it with the frame area
    ev = dataclasses.replace(base.eval, panoptic_stuff_area_limit=64)
    return dataclasses.replace(base, model=model, eval=ev)


def _train(cfg_model, steps=300):
    """~300 steps: the class head needs ~200+ steps before the matched
    slots' scores clear the production 0.85 keep threshold (the positive
    PQ term is dice-gated, so class confidence trails mask quality —
    measured 0.94+ at 300 steps, <0.5 at 80)."""
    import optax

    from slotvps_tpu.models.detector import init_model
    from slotvps_tpu.training.step import (make_optimizer, make_train_batch,
                                           train_step)

    params0 = init_model(jax.random.PRNGKey(0), cfg_model)

    img, gt = _synthetic_frame(H, W)
    ref_img = np.roll(img, 6, axis=1)
    mean = np.asarray((123.675, 116.28, 103.53), np.float32)
    std = np.asarray((58.395, 57.12, 57.375), np.float32)

    def norm(im):
        return ((im[..., ::-1].astype(np.float32) - mean) / std)[None]

    g = 4
    qh, qw = H // 4, W // 4
    gt_masks = np.zeros((1, g, qh, qw), np.float32)
    ref_masks = np.zeros((1, g, qh, qw), np.float32)
    for i, m in enumerate(gt.masks):
        gt_masks[0, i] = m[::4, ::4]
        ref_masks[0, i] = np.roll(m, 6, axis=1)[::4, ::4]
    # slot 2: the background as a STUFF segment (class 0) — without a
    # kept stuff slot the panoptic argmax hands every background pixel
    # to the nearest thing, whose ballooned region then fails fusion's
    # semantic majority vote and the instance is dropped
    bg = 1.0 - np.clip(gt_masks[0, 0] + gt_masks[0, 1], 0, 1)
    gt_masks[0, 2] = bg
    ref_masks[0, 2] = 1.0 - np.clip(ref_masks[0, 0] + ref_masks[0, 1], 0, 1)
    labels = np.zeros((1, g), np.int32)
    labels[0, :3] = [11, 12, 0]
    valid = np.zeros((1, g), bool)
    valid[0, :3] = True
    semantic = gt.semantic[::4, ::4].astype(np.int32)[None]
    pids = np.zeros((1, g), np.int32)
    pids[0, :2] = [1, 2]

    batch = make_train_batch(
        img=jnp.asarray(norm(img)), ref_img=jnp.asarray(norm(ref_img)),
        gt_labels=jnp.asarray(labels), gt_masks=jnp.asarray(gt_masks),
        gt_valid=jnp.asarray(valid), gt_semantic=jnp.asarray(semantic),
        ref_gt_labels=jnp.asarray(labels),
        ref_gt_masks=jnp.asarray(ref_masks),
        ref_gt_valid=jnp.asarray(valid), gt_pids=jnp.asarray(pids))

    opt = make_optimizer(lr=2e-3, params=params0)
    opt_state = opt.init(params0)
    step = jax.jit(functools.partial(train_step, cfg=cfg_model,
                                     optimizer=opt))
    params = params0
    for _ in range(steps):
        params, opt_state, metrics = step(params, opt_state, batch)
    return params0, params, img, gt


def _video_items(img, n=6):
    items = []
    for t in range(n):
        items.append({
            "img": np.asarray(img, np.uint8)[None],  # [1, H, W, 3] like
                                                     # data/pipeline.preprocess
            "meta": {
                "ori_shape": (H, W), "img_shape": (H, W),
                "is_first": t == 0,
                "filename": f"0001_{t:06d}_city_img.png",
            },
        })
    return items


def _gt_artifacts(gt, n=6):
    from slotvps_tpu.eval.color import id2rgb

    id_map = np.ones((H, W), np.uint32)  # stuff: category 0, id 1
    id_map[gt.masks[0] > 0] = 1001       # thing category 11
    id_map[gt.masks[1] > 0] = 1002       # thing category 12
    segs = [
        {"id": 1, "category_id": 0, "iscrowd": 0,
         "area": int((id_map == 1).sum())},
        {"id": 1001, "category_id": 11, "iscrowd": 0,
         "area": int((id_map == 1001).sum())},
        {"id": 1002, "category_id": 12, "iscrowd": 0,
         "area": int((id_map == 1002).sum())},
    ]
    gt_annos = [{"segments_info": [dict(s) for s in segs]}
                for _ in range(n)]
    gt_pans = [id2rgb(id_map) for _ in range(n)]
    return gt_annos, gt_pans


def _eval_vpq(params, cfg, img, gt, out_dir):
    from slotvps_tpu.eval.color import CITYSCAPES_CATEGORIES
    from slotvps_tpu.eval.hooks import evaluate_panoptic, predict_panoptic

    items = _video_items(img)
    pred_pans_2ch, names = predict_panoptic(params, cfg, iter(items))
    gt_annos, gt_pans = _gt_artifacts(gt)
    summary = evaluate_panoptic(
        pred_pans_2ch, names, cfg, list(CITYSCAPES_CATEGORIES), gt_annos,
        gt_pans, output_dir=str(out_dir))
    return summary


@pytest.mark.slow
def test_train_then_eval_vpq_rises(tmp_path):
    cfg = _full_cfg()
    params0, params, img, gt = _train(cfg.model)

    init_summary = _eval_vpq(params0, cfg, img, gt, tmp_path / "init")
    trained_summary = _eval_vpq(params, cfg, img, gt, tmp_path / "trained")

    # artifacts really were written by the full pipeline
    assert (tmp_path / "trained" / "vpq-0.txt").exists()
    assert (tmp_path / "trained" / "pred.json").exists()
    assert (tmp_path / "trained" / "vpq-final.txt").exists()

    # random init keeps nothing meaningful; the trained model must climb
    # substantially toward 100 on its own training scene
    assert init_summary["vpq_all"] < 15.0, init_summary["vpq_all"]
    assert trained_summary["vpq_all"] > init_summary["vpq_all"] + 20, (
        init_summary["vpq_all"], trained_summary["vpq_all"])
    assert trained_summary["vpq_stuff"] > 50.0, trained_summary
