"""Model zoo: functional modules over explicit parameter pytrees.

Replaces the reference's registry-built ``nn.Module`` tree
(reference mmdet/models/builder.py:16-33) with pure ``init_*`` /
``apply``-style functions.  Parameter trees are nested dicts of jnp arrays,
so they shard with ``jax.sharding`` and convert 1:1 from torch checkpoints.
"""
