"""Cityscapes-VPS video dataset (COCO-json, test mode).

Reference: mmdet/datasets/cityscapes_vps.py:14-327 ``CityscapesVPSDataset``.
Test-mode behavior reproduced:
  * images sorted by the json order; ``iid = vid * 10000 + fid``
    (reference :57-58; VIPER uses 100000),
  * the reference frame is the previous image within an
    ``nframes_span_test``-frame window; the first frame of each span refs
    itself (reference :258-264),
  * ``is_first`` for video-state reset is ``fid == 1``
    (reference vps_temporal_slots.py:227).

Training annotation parsing (bboxes/labels/RLE masks/track ids) is in
``parse_ann_info`` for the training path.
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from slotvps_tpu.data.pipeline import preprocess


class CityscapesVPSDataset:
    def __init__(
        self,
        ann_file: str,
        img_prefix: str,
        nframes_span_test: int = 30,
        iid_divisor: int = 10000,
        scale: Tuple[int, int] = (2048, 1024),
    ):
        with open(ann_file) as f:
            data = json.load(f)
        self.img_infos: List[dict] = data["images"]
        self.categories = data.get("categories", [])
        self.anns = data.get("annotations", [])
        self.img_prefix = img_prefix
        self.nframes_span_test = nframes_span_test
        self.iid_divisor = iid_divisor
        self.scale = scale

    def __len__(self):
        return len(self.img_infos)

    def frame_ids(self, idx: int) -> Tuple[int, int]:
        iid = self.img_infos[idx]["id"]
        return iid // self.iid_divisor, iid % self.iid_divisor

    def ref_index(self, idx: int) -> int:
        """Previous frame within the test span; self for span starts
        (reference cityscapes_vps.py:258-264)."""
        return idx - 1 if idx % self.nframes_span_test > 0 else idx

    def load_image(self, idx: int) -> np.ndarray:
        import cv2

        path = osp.join(self.img_prefix, self.img_infos[idx]["file_name"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img

    def __getitem__(self, idx: int) -> Dict:
        img, meta = preprocess(self.load_image(idx), self.scale)
        vid, fid = self.frame_ids(idx)
        meta.update(
            iid=self.img_infos[idx]["id"], vid=vid, fid=fid,
            is_first=(fid == 1),
            filename=self.img_infos[idx]["file_name"],
            ref_index=self.ref_index(idx), index=idx,
        )
        return {"img": img, "meta": meta}

    def __iter__(self) -> Iterator[Dict]:
        for i in range(len(self)):
            yield self[i]
