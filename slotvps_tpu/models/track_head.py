"""SimpleTrackHead — cross-frame instance association.

Reference: mmdet/models/detectors/simple_track_head.py:21-93 (lineage:
MaskTrackRCNN).  Two FC(256->256) layers with ReLU between (not after) on
both query sets, then a correlation matrix ``x @ ref.T`` with an all-zero
"new object" column prepended.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from slotvps_tpu.config import TrackHeadConfig
from slotvps_tpu.models import layers as L


def init_track_head(key, cfg: TrackHeadConfig) -> Dict:
    ks = jax.random.split(key, cfg.num_fcs_query)
    return {
        "fcs": [
            L.init_linear(ks[i], cfg.in_channels_query,
                          cfg.in_channels_query, init="normal001")
            for i in range(cfg.num_fcs_query)
        ],
    }


def _embed(params, x):
    n = len(params["fcs"])
    for i, fc in enumerate(params["fcs"]):
        x = L.linear(fc, x)
        if i < n - 1:
            x = L.relu(x)
    return x


def apply_track_head(params: Dict, x_query: jnp.ndarray,
                     ref_x_query: jnp.ndarray) -> jnp.ndarray:
    """x_query: [N, D] current embeddings; ref_x_query: [M, D] previous.

    Returns match scores [N, M+1]; column 0 is the "new object" score (0).
    """
    x = _embed(params, x_query)
    ref = _embed(params, ref_x_query)
    prod = x @ ref.T
    dummy = jnp.zeros((prod.shape[0], 1), prod.dtype)
    return jnp.concatenate([dummy, prod], axis=1)
