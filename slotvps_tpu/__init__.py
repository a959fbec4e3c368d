"""slotvps_tpu: a TPU-native (JAX/XLA/Pallas) video panoptic segmentation framework.

Re-implements the capabilities of Slot-VPS (CVPR 2022, reference:
SAITPublic/SlotVPS) as an idiomatic JAX framework:

- functional model graph (pure functions over parameter pytrees) instead of
  mmdetection registries + nn.Module mutation
  (reference: mmdet/models/builder.py, mmdet/utils/registry.py),
- one typed config (``slotvps_tpu.config``) instead of three config systems
  (reference: configs/*.py + tools/config/config.py + argparse),
- fixed-capacity slot pytrees with validity masks so the whole per-frame step
  jits (reference mutates variable-length ``Instances``,
  mmdet/models/structures/instances.py),
- the per-frame video recurrence as explicit carried state
  (reference: ``self.test_track_instances`` mutation,
  mmdet/models/detectors/vps_temporal_slots.py:207-469),
- Pallas TPU kernels for the hot ops (deformable conv, slot attention).
"""

__version__ = "0.1.0"

from slotvps_tpu import config  # noqa: F401
