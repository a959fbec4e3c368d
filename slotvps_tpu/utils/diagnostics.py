"""DCN sampling-halo diagnostics.

The reference CUDA deformable conv samples at unbounded offsets
(reference mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu
``deformable_im2col``); the TPU paths (ops/deform_conv.py,
ops/pallas/deform_conv.py) clamp each tap into a +-halo window of its
rigid position.  A trained ``conv_offset`` head whose offsets exceed the
halo would silently clamp — these helpers make that measurable at
checkpoint-load time (VERDICT r2 ask #5)."""

from __future__ import annotations

import warnings
from typing import Optional

import numpy as np


def effective_halo(sh_cfg) -> int:
    """The halo a SemanticHeadConfig actually runs with (0 = per-impl
    default: 8 for the XLA path, 4 for the tuned Pallas kernel)."""
    if sh_cfg.dcn_halo:
        return sh_cfg.dcn_halo
    return 4 if sh_cfg.dcn_impl.startswith("pallas") else 8


def measure_max_dcn_offset(params, cfg, image=None, hw=(256, 512),
                           seed: int = 0) -> float:
    """Max |offset| component any semantic-tower DCN block emits on a
    calibration image (random-normal by default; pass a real normalized
    [1, H, W, 3] image for a tighter estimate).

    Walks backbone -> FPN -> each tower block per level, collecting the
    offset-conv outputs before the deformable convs consume them."""
    import jax
    import jax.numpy as jnp

    from slotvps_tpu.models import layers as L
    from slotvps_tpu.models.detector import apply_backbone
    from slotvps_tpu.models.fpn import apply_fpn
    from slotvps_tpu.models.semantic_head import _dcn_block

    if image is None:
        rng = np.random.default_rng(seed)
        image = jnp.asarray(rng.standard_normal((1, *hw, 3)), jnp.float32)

    sh = cfg.semantic_head

    @jax.jit
    def run(params, img):
        img = img.astype(jnp.dtype(cfg.compute_dtype))
        feats = apply_backbone(params, cfg, img)
        fpn_outs = apply_fpn(params["fpn"], feats,
                             num_outs=cfg.fpn.num_outs)
        maxima = []
        for x in fpn_outs[:sh.num_levels]:
            for block in params["semantic_head"]["tower"]:
                off = L.conv2d(block["offset"], x, padding=1)
                maxima.append(jnp.abs(off.astype(jnp.float32)).max())
                # exact (unclamped-within-16) features for the next block
                x = _dcn_block(block, x, sh.gn_groups, impl="jax", halo=16)
        return jnp.stack(maxima)

    return float(np.asarray(run(params, image)).max())


def check_dcn_halo(params, cfg, image=None, warn: bool = True
                   ) -> tuple[float, int, int]:
    """Measure the checkpoint's offset range vs the configured halo.

    Returns ``(max_offset, halo_in_effect, recommended_halo)`` where
    ``recommended_halo >= halo_in_effect`` only if the measured offsets
    would clamp.  Callers (cli/test_eval_vpq.py) auto-raise
    ``semantic_head.dcn_halo`` to the recommendation."""
    eff = effective_halo(cfg.semantic_head)
    mx = measure_max_dcn_offset(params, cfg, image=image)
    rec = max(eff, int(np.ceil(mx)))
    if warn and rec > eff:
        warnings.warn(
            f"converted conv_offset heads emit offsets up to {mx:.2f} px "
            f"but the DCN halo in effect is {eff} px — samples would be "
            f"clamped (the reference CUDA kernel is unbounded). Raise "
            f"SemanticHeadConfig.dcn_halo to {rec}.", RuntimeWarning)
    return mx, eff, rec
