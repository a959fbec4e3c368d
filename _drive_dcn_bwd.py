"""Verify drive: full train_step through the public API with the Pallas
DCN custom-vjp vs the XLA impl (same halo), interpret mode on CPU."""
import dataclasses
import functools
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize registers axon
import jax.numpy as jnp
import optax
from jax.experimental.pallas import tpu as pltpu

from slotvps_tpu.config import ModelConfig, ResNetConfig, SlotHeadConfig
from slotvps_tpu.models.detector import init_model
from slotvps_tpu.training.step import (make_optimizer, make_train_batch,
                                       train_step)

base = ModelConfig(
    resnet=ResNetConfig(depth=18),
    slot_head=SlotHeadConfig(per_dh_num_heads=(1, 1, 1, 1), dh_num_heads=4,
                             apply_temporal_query_atten_stages=(2, 3)),
    proposal_num=20,
)
h, w, g = 32, 64, 4
rng = np.random.default_rng(0)
img = rng.standard_normal((1, h, w, 3)).astype(np.float32)
ref_img = np.roll(img, 6, axis=2)
qh, qw = h // 4, w // 4
gt_masks = np.zeros((1, g, qh, qw), np.float32)
gt_masks[0, 0, 2:6, 3:9] = 1
gt_masks[0, 1, 1:4, 10:15] = 1
labels = np.zeros((1, g), np.int32); labels[0, :2] = [11, 12]
valid = np.zeros((1, g), bool); valid[0, :2] = True
semantic = np.zeros((1, qh, qw), np.int32); semantic[0, 4:] = 1
pids = np.zeros((1, g), np.int32); pids[0, :2] = [1, 2]
batch = make_train_batch(
    img=jnp.asarray(img), ref_img=jnp.asarray(ref_img),
    gt_labels=jnp.asarray(labels), gt_masks=jnp.asarray(gt_masks),
    gt_valid=jnp.asarray(valid), gt_semantic=jnp.asarray(semantic),
    ref_gt_labels=jnp.asarray(labels), ref_gt_masks=jnp.asarray(gt_masks),
    ref_gt_valid=jnp.asarray(valid), gt_pids=jnp.asarray(pids))

out = {}
for impl in ["jax", "pallas_f32"]:
    cfg = dataclasses.replace(base, semantic_head=dataclasses.replace(
        base.semantic_head, dcn_impl=impl, dcn_halo=4))
    params = init_model(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=2e-3, params=params)
    opt_state = opt.init(params)
    step = jax.jit(functools.partial(train_step, cfg=cfg, optimizer=opt))
    with pltpu.force_tpu_interpret_mode():
        params2, _, metrics = step(params, opt_state, batch)
        m = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), (impl, m)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(params2)), impl
    out[impl] = m
    print(impl, {k: round(v, 6) for k, v in sorted(m.items())}, flush=True)

for k in out["jax"]:
    a, b = out["jax"][k], out["pallas_f32"][k]
    assert abs(a - b) <= 1e-3 * max(1.0, abs(a)), (k, a, b)
print("DRIVE_OK: pallas train_step == jax train_step (1e-3), finite")
