"""Training CLI.

The reference never released training (reference vps_temporal_slots.py:
496-497, README.md:64); this driver provides the capability natively using
the reference's released *data* recipe and documented loss recipe:

  * reference-frame sampling with the full offsets grammar
    (data/dataset.py:sample_train_refs, reference cityscapes_vps.py:102-197),
  * the released train pipeline: multiscale Resize (ratio 0.8-1.5),
    RandomFlip, Normalize, RandomCrop(800x1600), Pad/32, semantic-map
    replay + 1/4x rescale, FixedImageRandomShift pseudo-video
    (data/transforms.py, reference r50_fpn_slotvps.py:123-146),
  * losses: PQ + mask-id + deep supervision + semantic CE + track-head
    match CE + instance discrimination (training/losses.py),
  * AdamW lr 1e-4 wd 1e-4 clip 1.0, warmup 500 iters ratio 1/3, steps
    [8, 11] of 12 epochs (reference r50_fpn_slotvps.py:195-208),
  * RepeatDataset(times=8) epoch semantics (reference config :166-168),
  * checkpoint/resume of {params, opt_state, step} (--resume_from).

Usage:
  python -m slotvps_tpu.cli.train --ann_file ... --img_prefix ... \
      --seg_prefix ... --work_dir work_dirs/run1
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np

from slotvps_tpu.config import named_config


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="slotvps_tpu train")
    p.add_argument("--config", default="r50_fpn_slotvps")
    p.add_argument("--ann_file", required=True)
    p.add_argument("--img_prefix", required=True)
    p.add_argument("--seg_prefix", default=None,
                   help="semantic labelmap dir (train/labelmap); without "
                        "it loss_sem has nothing to supervise")
    p.add_argument("--work_dir", default="work_dirs/slotvps_tpu")
    p.add_argument("--resume_from", default=None)
    p.add_argument("--total_epochs", type=int, default=12)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_per_device", type=int, default=1)
    p.add_argument("--crop", type=int, nargs=2, default=(800, 1600))
    p.add_argument("--gt_capacity", type=int, default=64)
    p.add_argument("--offsets", default="0_shift_3")
    p.add_argument("--repeat_times", type=int, default=8)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dcn_impl", default=None,
                   choices=["jax", "pallas", "pallas_f32"],
                   help="semantic-tower DCN implementation (default: the "
                        "config's; 'pallas' runs the one-hot-matmul TPU "
                        "kernel forward AND backward via its custom vjp)")
    p.add_argument("--data_workers", type=int, default=2,
                   help="batch-assembly worker threads (reference analog: "
                        "DataLoader workers, loader/build_loader.py:18)")
    p.add_argument("--prefetch_batches", type=int, default=2,
                   help="per-worker look-ahead of assembled batches")
    # train-time periodic eval (reference DistEvalHook,
    # mmdet/core/evaluation/eval_hooks.py:20-83)
    p.add_argument("--eval_every", type=int, default=0,
                   help="run val VPQ every N epochs (0 = off)")
    p.add_argument("--val_ann_file", default=None)
    p.add_argument("--val_img_prefix", default=None)
    p.add_argument("--val_truth_dir", default=None)
    p.add_argument("--val_pan_gt_json_file", default=None)
    p.add_argument("--val_max_videos", type=int, default=10,
                   help="bound the val slice evaluated per hook firing")
    return p.parse_args(argv)


def lr_schedule(base_lr, steps_per_epoch, total_epochs=12,
                warmup_iters=500, warmup_ratio=1.0 / 3,
                decay_epochs=(8, 11)):
    """Step schedule with linear warmup (reference r50_fpn_slotvps.py:
    198-208)."""
    import optax

    boundaries = {e * steps_per_epoch: 0.1 for e in decay_epochs}
    step_fn = optax.piecewise_constant_schedule(base_lr, boundaries)

    def schedule(count):
        import jax.numpy as jnp

        warm = base_lr * (warmup_ratio
                          + (1 - warmup_ratio) * count / warmup_iters)
        return jnp.where(count < warmup_iters, warm, step_fn(count))

    return schedule


def _frame_gt(dataset, idx, seg_prefix, semantic2label):
    """Decode one frame's GT into a transforms.FrameGT."""
    from slotvps_tpu.data.mask import decode_mask
    from slotvps_tpu.data.transforms import FrameGT

    ann = dataset.parse_ann_info(idx)
    h = dataset.img_infos[idx].get("height")
    w = dataset.img_infos[idx].get("width")
    masks = []
    for m in ann["masks"]:
        if m is None:
            masks.append(np.zeros((h, w), np.uint8))
        else:
            masks.append(decode_mask(m, h, w).astype(np.uint8))
    semantic = None
    if seg_prefix is not None:
        semantic = dataset.load_semantic(idx, seg_prefix, semantic2label)
    return FrameGT(bboxes=ann["bboxes"], labels=ann["labels"],
                   obj_ids=ann["obj_ids"], masks=masks, semantic=semantic)


def make_sample(dataset, idx, args, cfg, rng, aug):
    """One training sample through the full reference pipeline; returns
    None when the sample has no usable GT (caller resamples)."""
    from slotvps_tpu.data.dataset import CITYSCAPES_SEMANTIC2LABEL
    from slotvps_tpu.data.transforms import apply_train_pipeline

    # RepeatDataset indices run to times*N-1; base-dataset methods
    # (sample_train_refs/parse_ann_info/load_image/img_infos) need the
    # base-space index.
    if hasattr(dataset, "translate_index"):
        idx = dataset.translate_index(idx)
    ref = dataset.sample_train_refs(idx, args.offsets, rng)
    if ref is None:
        return None
    gt = _frame_gt(dataset, idx, args.seg_prefix,
                   CITYSCAPES_SEMANTIC2LABEL)
    if len(gt.labels) == 0:
        return None
    ref_idx = ref.ref_indices[int(rng.integers(0, len(ref.ref_indices)))]
    img = dataset.load_image(idx)
    if ref.pseudo_video:
        ref_img, ref_gt = None, None
    else:
        ref_img = dataset.load_image(ref_idx)
        ref_gt = _frame_gt(dataset, ref_idx, args.seg_prefix,
                           CITYSCAPES_SEMANTIC2LABEL)
        if len(ref_gt.labels) == 0:
            return None
    return apply_train_pipeline(img, gt, ref_img, ref_gt, aug, rng,
                                pseudo_video=ref.pseudo_video)


def _pad_gt(gt, gt_pids, capacity, quarter_shape, stuff_offset,
            semantic_nx=None, num_stuff=11):
    """Pad variable-length FrameGT to the fixed capacity at 1/4 res.

    ``semantic_nx`` (quarter-res semantic map, 255=ignore) additionally
    appends one STUFF slot per present stuff class (ids < num_stuff).
    Without stuff slots the slot head only ever learns things, and at
    inference the panoptic argmax hands every background pixel to the
    nearest thing — whose ballooned region then fails the fusion stage's
    semantic majority vote (eval/fusion.py), dropping the instance.
    MaX-DeepLab-style slot training supervises stuff regions as slots for
    exactly this reason (the reference's 19-class loss space counts
    labels 0..10 as stuff)."""
    import cv2

    g = capacity
    qh, qw = quarter_shape
    labels = np.zeros((g,), np.int32)
    masks = np.zeros((g, qh, qw), np.float32)
    valid = np.zeros((g,), bool)
    pids = np.zeros((g,), np.int32)
    n = min(len(gt.labels), g)
    for i in range(n):
        labels[i] = gt.labels[i] + stuff_offset  # things in 19-class space
        masks[i] = cv2.resize(gt.masks[i].astype(np.uint8), (qw, qh),
                              interpolation=cv2.INTER_NEAREST)
        valid[i] = True
        if gt_pids is not None:
            pid = int(gt_pids[i])
            pids[i] = pid if pid <= g else 0
    if semantic_nx is not None:
        for cls in [c for c in np.unique(semantic_nx) if c < num_stuff]:
            if n >= g:
                break
            labels[n] = int(cls)
            masks[n] = (semantic_nx == cls).astype(np.float32)
            valid[n] = True
            n += 1
    return labels, masks, valid, pids


def make_batch(dataset, indices, args, cfg, rng, aug):
    """Host-side batch assembly through the real train pipeline."""
    from slotvps_tpu.training.step import TrainBatch

    stuff_offset = cfg.model.stuff_num - 1
    ch, cw = args.crop
    qh, qw = ch // 4, cw // 4
    cols = {f: [] for f in TrainBatch._fields}
    for idx in indices:
        out = None
        for _ in range(20):  # resample on degenerate crops/shifts
            out = make_sample(dataset, int(idx), args, cfg, rng, aug)
            if out is not None:
                break
            idx = int(rng.integers(0, len(dataset)))
        if out is None:
            raise RuntimeError("could not sample a valid training clip")
        sem = out["gt_semantic_seg_nx"]
        if sem is None:
            sem = np.full((qh, qw), 255, np.int32)
        n_stuff = cfg.model.stuff_num - 1  # 11 stuff classes (0..10)
        labels, masks, valid, pids = _pad_gt(
            out["gt"], out["gt_pids"], args.gt_capacity, (qh, qw),
            stuff_offset, semantic_nx=sem, num_stuff=n_stuff)
        ref_sem = out.get("ref_semantic_seg")
        rlabels, rmasks, rvalid, _ = _pad_gt(
            out["ref_gt"], None, args.gt_capacity, (qh, qw), stuff_offset,
            # nearest-subsample to the mask grid (seg_nx equivalent)
            semantic_nx=None if ref_sem is None else ref_sem[::4, ::4],
            num_stuff=n_stuff)
        cols["img"].append(out["img"])
        cols["ref_img"].append(out["ref_img"])
        cols["gt_labels"].append(labels)
        cols["gt_masks"].append(masks)
        cols["gt_valid"].append(valid)
        cols["gt_semantic"].append(sem.astype(np.int32))
        cols["ref_gt_labels"].append(rlabels)
        cols["ref_gt_masks"].append(rmasks)
        cols["ref_gt_valid"].append(rvalid)
        cols["gt_pids"].append(pids)
    return TrainBatch(**{k: np.stack(v) for k, v in cols.items()})


def save_train_state(path, params, opt_state, step):
    from slotvps_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(os.path.abspath(path),
                    {"params": params, "opt_state": opt_state,
                     "step": step})


def load_train_state(path, params, opt_state):
    from slotvps_tpu.utils.checkpoint import load_checkpoint

    like = {"params": params, "opt_state": opt_state, "step": 0}
    state = load_checkpoint(os.path.abspath(path), like)
    return state["params"], state["opt_state"], int(state["step"])


def main(argv=None):
    from slotvps_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from slotvps_tpu.data.dataset import CityscapesVPSDataset, RepeatDataset
    from slotvps_tpu.data.transforms import TrainAugConfig
    from slotvps_tpu.models.detector import init_model
    from slotvps_tpu.parallel.mesh import batch_sharding, make_mesh
    from slotvps_tpu.training.step import (
        TrainBatch, make_optimizer, train_step)
    from slotvps_tpu.utils.profiler import count_params, params_to_string

    args = parse_args(argv)
    cfg = named_config(args.config)
    if args.dcn_impl:
        import dataclasses
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, semantic_head=dataclasses.replace(
                cfg.model.semantic_head, dcn_impl=args.dcn_impl)))
    os.makedirs(args.work_dir, exist_ok=True)

    dataset = RepeatDataset(
        CityscapesVPSDataset(args.ann_file, args.img_prefix),
        args.repeat_times)
    aug = TrainAugConfig(crop_size=tuple(args.crop))
    n_dev = jax.device_count()
    batch = args.batch_per_device * n_dev
    # aspect-ratio group sampling (reference GroupSampler,
    # datasets/loader/sampler.py:37-73): each batch draws from one
    # orientation group so the padded static shape fits tight; groups are
    # padded to whole batches, so steps/epoch comes from the sampled
    # order, not len(dataset)
    from slotvps_tpu.data.sampler import (aspect_ratio_flags,
                                          group_shuffled_indices)
    flags = np.tile(aspect_ratio_flags(dataset.img_infos),
                    args.repeat_times)
    steps_per_epoch = max(
        len(group_shuffled_indices(flags, batch,
                                   np.random.default_rng(0))) // batch, 1)
    print(f"dataset: {len(dataset)} frames (x{args.repeat_times} repeat), "
          f"{n_dev} devices, batch {batch}, {steps_per_epoch} steps/epoch, "
          f"aspect groups {np.bincount(flags).tolist()}")

    params = init_model(jax.random.PRNGKey(args.seed), cfg.model)
    print(f"Model Params : {params_to_string(count_params(params))}")
    schedule = lr_schedule(args.lr, steps_per_epoch, args.total_epochs)

    optimizer = make_optimizer(lr=schedule, params=params)
    opt_state = optimizer.init(params)

    start_it = 0
    if args.resume_from:
        params, opt_state, start_it = load_train_state(
            args.resume_from, params, opt_state)
        print(f"resumed from {args.resume_from} at iter {start_it}")

    mesh = make_mesh(n_data=n_dev, n_model=1)
    bsh = batch_sharding(mesh)

    step_fn = jax.jit(functools.partial(
        train_step, cfg=cfg.model, optimizer=optimizer))

    from slotvps_tpu.data.loader import prefetch_ordered

    it = start_it
    t0 = time.time()
    host_wait = 0.0
    start_epoch = start_it // steps_per_epoch
    for epoch in range(start_epoch, args.total_epochs):
        # per-epoch/per-step derived rngs: deterministic under resume AND
        # under parallel batch assembly (each step's sampling is
        # independent of worker scheduling)
        order = group_shuffled_indices(
            flags, batch, np.random.default_rng((args.seed, epoch)))

        def build(s):
            srng = np.random.default_rng((args.seed, epoch, int(s)))
            idxs = order[s * batch:(s + 1) * batch]
            return make_batch(dataset, idxs, args, cfg, srng, aug)

        s0 = it % steps_per_epoch
        # batch assembly overlaps the device step: workers decode/augment
        # batches s+1, s+2... while step s trains
        stream = prefetch_ordered(build, range(s0, steps_per_epoch),
                                  prefetch=args.prefetch_batches,
                                  num_threads=args.data_workers)
        for _ in range(s0, steps_per_epoch):
            tw = time.perf_counter()
            hb = next(stream)
            host_wait += time.perf_counter() - tw
            db = TrainBatch(*(jax.device_put(jnp.asarray(x), bsh)
                              for x in hb))
            with mesh:
                params, opt_state, metrics = step_fn(params, opt_state, db)
            it += 1
            if it % args.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                n_it = max(it - start_it, 1)
                dt = (time.time() - t0) / n_it
                print(f"epoch {epoch} iter {it}: "
                      + " ".join(f"{k}={v:.4f}" for k, v in m.items())
                      + f" ({dt:.2f}s/iter, host wait "
                      + f"{host_wait / n_it:.2f}s/iter)")
        save_train_state(os.path.join(args.work_dir,
                                      f"epoch_{epoch + 1}"),
                         params, opt_state, it)
        if (args.eval_every and (epoch + 1) % args.eval_every == 0
                and args.val_ann_file):
            # periodic val VPQ with the live params (reference
            # DistEvalHook, eval_hooks.py:20-83)
            from slotvps_tpu.eval.hooks import run_val_eval

            te = time.time()
            summary = run_val_eval(
                params, cfg, args.val_ann_file, args.val_img_prefix,
                args.val_truth_dir, args.val_pan_gt_json_file,
                output_dir=os.path.join(args.work_dir,
                                        f"val_epoch_{epoch + 1}"),
                max_videos=args.val_max_videos)
            print(f"[eval] epoch {epoch + 1}: "
                  f"vpq_all={summary['vpq_all']:.2f} "
                  f"vpq_thing={summary['vpq_thing']:.2f} "
                  f"vpq_stuff={summary['vpq_stuff']:.2f} "
                  f"({time.time() - te:.0f}s)")
    print("done")


if __name__ == "__main__":
    main()
