"""Training CLI.

The reference never released training (reference vps_temporal_slots.py:
496-497, README.md:64); this driver provides the capability natively:
two-frame clips sampled with the reference's offsets grammar, the
documented loss recipe (training/losses.py), AdamW with the reference's
optimizer settings and step LR schedule (reference r50_fpn_slotvps.py:
195-208: lr 1e-4, wd 1e-4, clip 1.0, warmup 500 iters ratio 1/3,
steps [8, 11] of 12 epochs), data-parallel over a device mesh.

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
    p.add_argument("--work_dir", default="work_dirs/slotvps_tpu")
    p.add_argument("--resume_from", default=None)
    p.add_argument("--total_epochs", type=int, default=12)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_per_device", type=int, default=1)
    p.add_argument("--crop", type=int, nargs=2, default=(800, 1600))
    p.add_argument("--gt_capacity", type=int, default=64)
    p.add_argument("--offsets", default="0_shift_3")
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
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


def make_batch(dataset, indices, args, cfg, rng):
    """Host-side batch assembly: image pair + padded GT."""
    import cv2

    from slotvps_tpu.data.mask import decode_mask
    from slotvps_tpu.data.pipeline import preprocess
    from slotvps_tpu.training.step import TrainBatch

    ch, cw = args.crop
    g = args.gt_capacity
    imgs, refs, labels, masks, valids, sems = [], [], [], [], [], []
    for idx in indices:
        ref_idx = dataset.sample_ref_index(idx, args.offsets, rng)
        if ref_idx is None:
            ref_idx = idx
        img_raw = dataset.load_image(idx)
        ref_raw = dataset.load_image(ref_idx)
        # resize+crop to the fixed training shape
        img, _ = preprocess(cv2.resize(img_raw, (cw, ch)), (cw, ch))
        ref, _ = preprocess(cv2.resize(ref_raw, (cw, ch)), (cw, ch))
        ann = dataset.parse_ann_info(idx)
        gl = np.zeros((g,), np.int32)
        gm = np.zeros((g, ch // 4, cw // 4), np.float32)
        gv = np.zeros((g,), bool)
        sy = img_raw.shape[0] / ch
        n = min(len(ann["labels"]), g)
        for i in range(n):
            gl[i] = ann["labels"][i] + 10  # things in 19-class space
            if ann["masks"][i] is not None:
                m = decode_mask(ann["masks"][i], img_raw.shape[0],
                                img_raw.shape[1])
                m = cv2.resize(m, (cw // 4, ch // 4),
                               interpolation=cv2.INTER_NEAREST)
                gm[i] = m
            gv[i] = True
        imgs.append(img[0])
        refs.append(ref[0])
        labels.append(gl)
        masks.append(gm)
        valids.append(gv)
        sems.append(np.full((ch // 4, cw // 4), 255, np.int32))
    return TrainBatch(
        img=np.stack(imgs), ref_img=np.stack(refs),
        gt_labels=np.stack(labels), gt_masks=np.stack(masks),
        gt_valid=np.stack(valids), gt_semantic=np.stack(sems))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from slotvps_tpu.data.dataset import CityscapesVPSDataset
    from slotvps_tpu.models.detector import init_model
    from slotvps_tpu.parallel.mesh import batch_sharding, make_mesh
    from slotvps_tpu.training.step import (
        TrainBatch, make_optimizer, train_step)
    from slotvps_tpu.utils.checkpoint import save_checkpoint
    from slotvps_tpu.utils.profiler import count_params, params_to_string

    args = parse_args(argv)
    cfg = named_config(args.config)
    os.makedirs(args.work_dir, exist_ok=True)

    dataset = CityscapesVPSDataset(args.ann_file, args.img_prefix)
    n_dev = jax.device_count()
    batch = args.batch_per_device * n_dev
    steps_per_epoch = max(len(dataset) // batch, 1)
    print(f"dataset: {len(dataset)} frames, {n_dev} devices, "
          f"batch {batch}, {steps_per_epoch} steps/epoch")

    params = init_model(jax.random.PRNGKey(args.seed), cfg.model)
    print(f"Model Params : {params_to_string(count_params(params))}")
    schedule = lr_schedule(args.lr, steps_per_epoch, args.total_epochs)
    from slotvps_tpu.training.step import trainable_mask

    optimizer = optax.masked(
        optax.chain(optax.clip_by_global_norm(1.0),
                    optax.adamw(schedule, weight_decay=1e-4)),
        trainable_mask(params))
    opt_state = optimizer.init(params)

    mesh = make_mesh(n_data=n_dev, n_model=1)
    bsh = batch_sharding(mesh)

    step_fn = jax.jit(functools.partial(
        train_step, cfg=cfg.model, optimizer=optimizer))

    rng = np.random.default_rng(args.seed)
    it = 0
    t0 = time.time()
    for epoch in range(args.total_epochs):
        order = rng.permutation(len(dataset))
        for s in range(steps_per_epoch):
            idxs = order[s * batch:(s + 1) * batch]
            hb = make_batch(dataset, idxs, args, cfg, rng)
            db = TrainBatch(*(jax.device_put(jnp.asarray(x), bsh)
                              for x in hb))
            with mesh:
                params, opt_state, metrics = step_fn(params, opt_state, db)
            it += 1
            if it % args.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = (time.time() - t0) / it
                print(f"epoch {epoch} iter {it}: "
                      + " ".join(f"{k}={v:.4f}" for k, v in m.items())
                      + f" ({dt:.2f}s/iter)")
        save_checkpoint(
            os.path.abspath(os.path.join(args.work_dir,
                                         f"epoch_{epoch + 1}")), params)
    print("done")


if __name__ == "__main__":
    main()
