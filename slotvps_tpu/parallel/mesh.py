"""Device mesh + sharding specs.

TPU-native replacement for the reference's NCCL/torch.distributed stack
(reference mmdet/core/utils/dist_utils.py:10-71 bucketed all-reduce,
mmdet/apis/env.py:13-55 launchers, eval_hooks.py:40-79 pickle-gather):
a ``jax.sharding.Mesh`` with named axes and NamedSharding specs.  Gradient
all-reduce, barriers and gathers all become XLA collectives inserted by the
partitioner — there is nothing to hand-roll.

Axes:
  * ``data``  — data parallel over clips/frames (the only parallelism the
    reference has),
  * ``model`` — tensor parallel for the decoder FFN / attention heads and
    conv channels (reference has none; provided for scale-out).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/frame) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(params, mesh: Mesh):
    """Parameter shardings: tensor-parallel where profitable, replicated
    elsewhere.

    TP rule (scaling-book recipe): shard the decoder FFN's hidden dimension
    (256->2048 column-parallel, 2048->256 row-parallel) over 'model'; XLA
    inserts the reduce-scatter/all-gather pair on ICI.
    """
    n_model = mesh.shape["model"]

    def spec_for(path: str, leaf) -> P:
        if n_model > 1 and leaf.ndim == 2:
            if "linear1" in path and path.endswith("w") \
                    and leaf.shape[1] % n_model == 0:
                return P(None, "model")   # column parallel
            if "linear2" in path and path.endswith("w") \
                    and leaf.shape[0] % n_model == 0:
                return P("model", None)   # row parallel
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    specs = {path_str(kp): spec_for(path_str(kp), leaf) for kp, leaf in flat}

    def map_leaf(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(map_leaf, params)
