"""FPN neck (reference mmdet/models/necks/fpn.py:11-139).

1x1 laterals + top-down nearest x2 upsample + 3x3 output convs; extra
levels by stride-2 max-pool (``num_outs=5`` with 4 inputs in the reference
config; only P2..P5 feed the live heads, P6 exists for parity).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from slotvps_tpu.models import layers as L
from slotvps_tpu.ops.interpolate import upsample_x2_nearest


def init_fpn(key, in_channels: Sequence[int], out_channels: int) -> Dict:
    n = len(in_channels)
    ks = jax.random.split(key, 2 * n)
    return {
        "lateral": [
            L.init_conv(ks[i], 1, 1, in_channels[i], out_channels,
                        init="xavier")
            for i in range(n)
        ],
        "fpn": [
            L.init_conv(ks[n + i], 3, 3, out_channels, out_channels,
                        init="xavier")
            for i in range(n)
        ],
    }


def apply_fpn(params: Dict, inputs: Sequence[jnp.ndarray],
              num_outs: int = 5) -> List[jnp.ndarray]:
    laterals = [L.conv2d(p, x, padding=0)
                for p, x in zip(params["lateral"], inputs)]
    for i in range(len(laterals) - 1, 0, -1):
        laterals[i - 1] = laterals[i - 1] + upsample_x2_nearest(laterals[i])
    outs = [L.conv2d(p, lat, padding=1)
            for p, lat in zip(params["fpn"], laterals)]
    while len(outs) < num_outs:
        # stride-2 max pool with 1x1 window == strided slice
        outs.append(outs[-1][:, ::2, ::2, :])
    return outs
