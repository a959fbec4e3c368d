"""Sigmoid focal loss — pure-JAX replacement for the reference CUDA op
(reference mmdet/ops/sigmoid_focal_loss/src/sigmoid_focal_loss_cuda.cu,
python wrapper mmdet/ops/sigmoid_focal_loss/sigmoid_focal_loss.py:8-38).

Semantics follow the CUDA kernel: ``targets`` holds class indices in
[0, num_classes] where 0 means background; logit column c corresponds to
class c+1.  Train-path-only in the reference (the released code never calls
it at test time); provided for capability parity and for the training step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Per-element focal loss.

    logits:  [N, C]
    targets: [N] int, values in [0, C] (0 = background)
    returns: [N, C] loss terms (same reduction contract as the CUDA op:
    caller sums/averages).
    """
    n, c = logits.shape
    t = targets[:, None]  # [N, 1]
    cls = jnp.arange(1, c + 1, dtype=targets.dtype)[None, :]  # [1, C]
    pos = (t == cls).astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    # numerically-stable log terms
    log_p = jax.nn.log_sigmoid(logits)
    log_1p = jax.nn.log_sigmoid(-logits)
    pos_term = -alpha * jnp.power(1.0 - p, gamma) * log_p
    neg_term = -(1.0 - alpha) * jnp.power(p, gamma) * log_1p
    return pos * pos_term + (1.0 - pos) * neg_term
