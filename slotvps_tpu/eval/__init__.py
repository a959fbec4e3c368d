"""Host-side evaluation: panoptic fusion, tube-id color assignment, VPQ/PQ.

Mirrors the behavior of the reference's eval helpers
(tools/dataset/cityscapes_vps.py, tools/dataset/base_dataset.py,
tools/eval_vpq.py) with vectorized numpy implementations.
"""

from slotvps_tpu.eval import color, fusion, pq, vpq  # noqa: F401
