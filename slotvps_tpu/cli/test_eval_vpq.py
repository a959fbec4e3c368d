"""End-to-end inference + VPQ evaluation CLI.

Equivalent of the reference's canonical entry point
(reference tools/test_eval_vpq.py:18-197 + scripts/test_eval_vpq.sh):
load config -> build model -> stream frames through the jitted pipeline ->
fuse panoptic outputs -> write pred.json + pan_pred/*.png -> compute VPQ at
window sizes λ ∈ {0, 5, 10, 15}.

Usage:
  python -m slotvps_tpu.cli.test_eval_vpq \
      --config r50_fpn_slotvps \
      --ann_file data/cityscapes_vps/im_all_info_val_city_vps.json \
      --img_prefix data/cityscapes_vps/val/img_all \
      --checkpoint weights.pth --out work_dirs/out.pkl \
      --truth_dir data/cityscapes_vps/val/panoptic_video \
      --pan_gt_json_file data/cityscapes_vps/panoptic_gt_val_city_vps.json
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle
import time

import numpy as np

from slotvps_tpu.config import named_config
from slotvps_tpu.data.dataset import CityscapesVPSDataset
from slotvps_tpu.data.loader import PrefetchLoader
from slotvps_tpu.eval import vpq as vpq_mod
from slotvps_tpu.eval.fusion import inference_panoptic_video, unify_pan_result
from slotvps_tpu.inference import InferencePipeline


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="slotvps_tpu test + VPQ eval")
    p.add_argument("--config", default="r50_fpn_slotvps")
    p.add_argument("--checkpoint", default=None,
                   help=".pth (reference format, converted on load), "
                        "orbax dir, or empty for random init")
    p.add_argument("--ann_file", required=True)
    p.add_argument("--img_prefix", required=True)
    p.add_argument("--out", default="work_dirs/slotvps_tpu/out.pkl")
    p.add_argument("--load", action="store_true",
                   help="resume from the cached *_pred_pans_2ch.pkl")
    p.add_argument("--n_video", type=int, default=50)
    p.add_argument("--truth_dir", default=None)
    p.add_argument("--pan_gt_json_file", default=None)
    p.add_argument("--pan_im_json_file", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tuned", action="store_true",
                   help="TPU-tuned kernels: bf16 activations, Pallas DCN, "
                        "VMEM-resident postproc claim scan")
    p.add_argument("--scan", action="store_true",
                   help="whole-clip lax.scan inference (one device "
                        "dispatch + one readback per video span instead "
                        "of per frame; assumes videos align with "
                        "nframes_span_test chunks, as the eval datasets "
                        "do — verified bit-identical to streaming)")
    p.add_argument("--batch_videos", type=int, default=0,
                   help="lockstep-batch N videos per device step (the "
                        "bench.py configuration — frame t of N clips in "
                        "one dispatch; shards the video axis over the "
                        "device mesh when >1 device is visible). Like "
                        "--scan, requires videos aligned with "
                        "nframes_span_test chunks; verified bit-identical "
                        "to streaming")
    p.add_argument("--save_diff_fig", action="store_true",
                   help="write pan_diff/*.png error maps (pred - gt, "
                        "zeroed where gt==0; reference eval_vpq.py:463-470)")
    p.add_argument("--debug_postproc", action="store_true",
                   help="per-frame postproc diagnostics: kept thing "
                        "classes/scores and per-id pixel areas (host-side "
                        "analog of the reference postprocessor's debug "
                        "prints, vps_temporal_slots.py:613-650)")
    p.add_argument("--draw_line_charts", action="store_true",
                   help="per-video / per-category VPQ figures (reference "
                        "--draw_line_charts)")
    return p.parse_args(argv)


def tune_config(cfg):
    import dataclasses

    m = cfg.model
    m = dataclasses.replace(
        m, compute_dtype="bfloat16",
        semantic_head=dataclasses.replace(
            m.semantic_head, dcn_impl="pallas", fused_sseg=True,
            # per-level halos (P2..P5): fine levels sample locally, coarse
            # levels get MORE range than the old uniform 4; checkpoint
            # loading measures the offsets the converted conv_offset heads
            # emit and auto-raises any level that would clamp (main below
            # + utils/diagnostics.check_dcn_halo)
            dcn_halo=(2, 3, 4, 6)[:m.semantic_head.num_levels]),
        postprocess=dataclasses.replace(m.postprocess, impl="fused"))
    return dataclasses.replace(cfg, model=m)


def build_params(args, cfg):
    import jax

    if args.checkpoint and args.checkpoint.endswith(".pth"):
        from slotvps_tpu.utils.checkpoint import load_torch_checkpoint
        return load_torch_checkpoint(args.checkpoint, cfg.model)
    if args.checkpoint:
        from slotvps_tpu.models.detector import init_model
        from slotvps_tpu.utils.checkpoint import load_checkpoint
        like = init_model(jax.random.PRNGKey(args.seed), cfg.model)
        return load_checkpoint(args.checkpoint, like)
    from slotvps_tpu.models.detector import init_model
    print("WARNING: no checkpoint given — using random init")
    return init_model(jax.random.PRNGKey(args.seed), cfg.model)


def main(argv=None):
    from slotvps_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    args = parse_args(argv)
    cfg = named_config(args.config)
    if args.tuned:
        cfg = tune_config(cfg)
    os.makedirs(osp.dirname(args.out) or ".", exist_ok=True)
    output_dir = args.out.replace(".pkl", "_pans_unified/")
    cache = args.out.replace(".pkl", "_pred_pans_2ch.pkl")

    dataset = CityscapesVPSDataset(
        args.ann_file, args.img_prefix,
        nframes_span_test=cfg.data.nframes_span_test,
        iid_divisor=cfg.data.iid_divisor,
        scale=cfg.data.img_scale,
        # ship uint8 frames, normalize on device: 4x fewer bytes over the
        # host->device link (the pipelines are upload/readback-bound on
        # slow links; see inference._device_normalize)
        uint8_images=True)
    print(f"dataset: {len(dataset)} frames")

    if args.load and osp.exists(cache):
        with open(cache, "rb") as f:
            pred_pans_2ch = pickle.load(f)
        names = sorted(i["file_name"] for i in dataset.img_infos)
    else:
        params = build_params(args, cfg)
        n_params = sum(np.prod(p.shape) for p in
                       __import__("jax").tree.leaves(params))
        print(f"Model Params : {n_params / 1e6:.2f} M")

        if args.checkpoint:
            # trained checkpoints (any format): measure the offsets the
            # conv_offset heads emit and widen the DCN sampling halo if
            # they would clamp (the reference CUDA kernel is unbounded).
            # Calibrate on REAL frames at eval resolution — offsets are
            # input-dependent, so a toy random image under-estimates —
            # and check_dcn_halo pads the measurement with a safety
            # margin for the frames it did not see.
            import dataclasses

            import jax.numpy as jnp

            from slotvps_tpu.inference import _device_normalize
            from slotvps_tpu.utils.diagnostics import check_dcn_halo
            calib_frames = []
            for i in {0, len(dataset) // 2, len(dataset) - 1}:
                item = dataset[i]
                calib_frames.append(_device_normalize(
                    jnp.asarray(item["img"])[None], cfg.data,
                    valid_hw=item["meta"]["img_shape"][:2]))
            mx, eff, rec = check_dcn_halo(params, cfg.model, warn=False,
                                          images=calib_frames)
            print(f"DCN offsets: checkpoint emits up to {mx:.2f} px "
                  f"(per-level halos in effect: {eff} px)")
            if rec != eff:
                print(f"WARNING: raising dcn_halo {eff} -> {rec} so no "
                      "sample clamps")
                m = cfg.model
                cfg = dataclasses.replace(cfg, model=dataclasses.replace(
                    m, semantic_head=dataclasses.replace(
                        m.semantic_head, dcn_halo=rec)))

        pipeline = None
        ssegs, panos, cls_inds, obj_ids, names = [], [], [], [], []
        t0 = time.time()

        def emit(res, meta):
            ssegs.append(res.sseg)
            panos.append(res.panoptic)
            cls_inds.append(res.cls_inds)
            obj_ids.append(res.obj_ids)
            names.append(osp.basename(meta["filename"]))
            if args.debug_postproc:
                ids, areas = np.unique(res.panoptic, return_counts=True)
                area_of = dict(zip(ids.tolist(), areas.tolist()))
                print(f"[postproc] {names[-1]}: "
                      f"{len(res.cls_inds)} things kept "
                      f"cls={res.cls_inds.tolist()} "
                      f"prob={[round(float(p), 3) for p in res.cls_prob]} "
                      f"obj_ids={res.obj_ids.tolist()} "
                      f"areas={[area_of.get(11 + r, 0) for r in range(len(res.cls_inds))]} "
                      f"void={area_of.get(255, 0)}")
            done = len(names)
            if done % 50 == 0:
                dt = time.time() - t0
                print(f"[{done}/{len(dataset)}] {done / dt:.2f} frames/s")

        def video_chunks():
            """Per-video item lists; enforces the chunk == video-span
            assumption --scan/--batch_videos document: the track pool and
            carried reference features must not bleed across videos."""
            span = cfg.data.nframes_span_test
            # batched mode: decode a full video group ahead so the host
            # pipeline overlaps the device steps (125 GB hosts; ~6 MB per
            # decoded uint8 1024x2048 frame)
            depth = max(2, (span * args.batch_videos + 1) // 2) \
                if args.batch_videos else 2
            items, done = [], 0
            for item in PrefetchLoader(dataset, prefetch=depth):
                items.append(item)
                if len(items) == span or done + len(items) == len(dataset):
                    firsts = [i for i, it in enumerate(items)
                              if it["meta"].get("is_first")]
                    if firsts != [0]:
                        raise RuntimeError(
                            f"--scan/--batch_videos require videos aligned "
                            f"with nframes_span_test={span} chunks, but "
                            f"the chunk starting at frame {done} has "
                            f"is_first flags at positions {firsts} "
                            f"(expected [0]); rerun in streaming mode")
                    done += len(items)
                    yield items
                    items = []

        if args.scan:
            # whole-clip scan: one dispatch + one readback per test span
            from slotvps_tpu.inference import VideoScanner

            scanner = None
            for items in video_chunks():
                if scanner is None:
                    scanner = VideoScanner(
                        params, cfg,
                        image_size=tuple(items[0]["meta"]["ori_shape"]),
                        valid_hw=tuple(items[0]["meta"]["img_shape"]))
                results = scanner.run_video([i["img"] for i in items])
                for res, it in zip(results, items):
                    emit(res, it["meta"])
        elif args.batch_videos:
            # lockstep batched multi-video inference: frame t of N videos
            # per device step, video axis sharded over the mesh — the
            # bench.py configuration (BASELINE config 5)
            from slotvps_tpu.inference import BatchedVideoPipeline

            bsz = args.batch_videos
            pipeline_b = None
            videos, metas = [], []

            def flush_group():
                nonlocal pipeline_b
                nvid = len(videos)
                while len(videos) < bsz:
                    # pad the tail group by repeating the last video; the
                    # padded copies' results are dropped below
                    videos.append(videos[-1])
                    metas.append(metas[-1])
                if pipeline_b is None:
                    pipeline_b = BatchedVideoPipeline(
                        params, cfg, bsz,
                        image_size=tuple(metas[0][0]["ori_shape"]),
                        valid_hw=tuple(metas[0][0]["img_shape"]))
                    print(f"batched inference: {bsz} videos/step over "
                          f"{pipeline_b.n_devices} device(s)")
                tg = time.time()
                res = pipeline_b.run_videos(videos)
                dt = time.time() - tg
                nf = nvid * len(videos[0])
                print(f"group of {nvid} videos: {nf} frames in {dt:.2f}s "
                      f"= {bsz * len(videos[0]) / dt:.2f} frames/s "
                      "(device steps + readback; first group includes "
                      "compile)")
                for v in range(nvid):
                    for t, meta in enumerate(metas[v]):
                        emit(res[v][t], meta)
                videos.clear()
                metas.clear()

            for items in video_chunks():
                videos.append([i["img"] for i in items])
                metas.append([i["meta"] for i in items])
                if len(videos) == bsz:
                    flush_group()
            if videos:
                flush_group()
        else:
            for item in PrefetchLoader(dataset):
                meta = item["meta"]
                if pipeline is None:
                    # emit at ori_shape: crops the /32 padding and resizes
                    # when the processed size differs (VIPER 1080p pads to
                    # 1088 — reference vps_temporal_slots.py:440-451)
                    pipeline = InferencePipeline(
                        params, cfg, image_size=tuple(meta["ori_shape"]),
                        valid_hw=tuple(meta["img_shape"]))
                res = pipeline.process_frame(item["img"], meta["is_first"])
                emit(res, meta)

        pans_2ch = unify_pan_result(
            ssegs, panos, cls_inds, obj_ids,
            stuff_area_limit=cfg.eval.panoptic_stuff_area_limit,
            id_last_stuff=cfg.eval.id_last_stuff)
        # sort by filename like the reference (test_eval_vpq.py:146-151)
        order = np.argsort(names)
        pred_pans_2ch = [pans_2ch[i] for i in order]
        names = [names[i] for i in order]
        with open(cache, "wb") as f:
            pickle.dump(pred_pans_2ch, f, protocol=2)

    if args.pan_im_json_file:
        with open(args.pan_im_json_file) as f:
            im_jsons = json.load(f)
        categories = im_jsons["categories"]
        names = sorted(x["file_name"] for x in im_jsons["images"])
    else:
        from slotvps_tpu.eval.color import CITYSCAPES_CATEGORIES
        categories = list(CITYSCAPES_CATEGORIES)

    pred_pans, pred_json = inference_panoptic_video(
        pred_pans_2ch, output_dir, categories, names,
        nframes_per_video=cfg.eval.nframes_per_video,
        labeled_fid=cfg.eval.labeled_fid, lambda_=cfg.eval.lambda_)
    print(f"==> wrote {output_dir}pred.json "
          f"({len(pred_json['annotations'])} annotations)")

    if args.pan_gt_json_file and args.truth_dir:
        from PIL import Image

        with open(args.pan_gt_json_file) as f:
            gt_jsons = json.load(f)
        n = len(pred_json["annotations"])
        gt_images = gt_jsons["images"][:n]
        gt_annos = gt_jsons["annotations"][:n]
        cats = {el["id"]: el for el in gt_jsons["categories"]}
        files = [i["file_name"]
                 .replace("_newImg8bit.png", "_final_mask.png")
                 .replace("_leftImg8bit.png", "_gtFine_color.png")
                 for i in gt_images]
        files.sort()
        gt_pans = [np.array(Image.open(osp.join(args.truth_dir, f)))
                   for f in files]
        if args.save_diff_fig:
            from slotvps_tpu.eval.vpq import save_diff_figs
            save_diff_figs(pred_pans, gt_pans,
                           [i["id"] + ".png" for i in gt_images],
                           output_dir)
        summary = vpq_mod.final_eval(
            pred_json["annotations"], gt_annos, gt_pans, pred_pans, cats,
            output_dir=output_dir,
            nframes_per_video=cfg.eval.nframes_per_video,
            draw_charts=args.draw_line_charts)
        print("vpq_all:%.4f" % summary["vpq_all"])
        print("vpq_thing:%.4f" % summary["vpq_thing"])
        print("vpq_stuff:%.4f" % summary["vpq_stuff"])
        print("vpq_errp:%.4f" % summary["vpq_errp"])


if __name__ == "__main__":
    main()
