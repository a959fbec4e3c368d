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

    # ------------------------------------------------------------------
    # training-mode support (reference cityscapes_vps.py:108-251)
    # ------------------------------------------------------------------

    def _ann_by_image(self):
        if not hasattr(self, "_ann_index"):
            idx: Dict[int, list] = {}
            for ann in self.anns:
                idx.setdefault(ann["image_id"], []).append(ann)
            self._ann_index = idx
        return self._ann_index

    def parse_ann_info(self, idx: int) -> Dict:
        """bboxes/labels/masks(raw)/obj_ids for one image
        (reference cityscapes_vps.py:273-327)."""
        info = self.img_infos[idx]
        cat2label = {c["id"]: i + 1 for i, c in enumerate(self.categories)}
        bboxes, labels, obj_ids, masks, ignore = [], [], [], [], []
        for ann in self._ann_by_image().get(info["id"], []):
            if ann.get("ignore", False):
                continue
            x1, y1, w, h = ann["bbox"]
            if ann["area"] <= 0 or w < 1 or h < 1:
                continue
            bbox = [x1, y1, x1 + w - 1, y1 + h - 1]
            if ann.get("iscrowd", False):
                ignore.append(bbox)
                continue
            bboxes.append(bbox)
            labels.append(cat2label.get(ann["category_id"],
                                        ann["category_id"]))
            masks.append(ann.get("segmentation"))
            obj_ids.append(ann.get("inst_id", -1))
        return dict(
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            obj_ids=np.asarray(obj_ids, np.int64),
            bboxes_ignore=np.asarray(ignore, np.float32).reshape(-1, 4),
            masks=masks,
        )

    def sample_ref_index(self, idx: int, offsets, rng) -> Optional[int]:
        """Training reference-frame sampling grammar
        (reference cityscapes_vps.py:108-197): '0' = same frame,
        '0_shift_N' = uniform in [-N, N], a list = explicit offsets,
        'all' = any frame of the video."""
        vid, fid = self.frame_ids(idx)
        same_vid = [i for i in range(len(self))
                    if self.frame_ids(i)[0] == vid]
        if offsets == "0":
            return idx
        if isinstance(offsets, str) and offsets.startswith("0_shift_"):
            n = int(offsets.split("_")[-1])
            cands = [i for i in same_vid
                     if abs(self.frame_ids(i)[1] - fid) <= n]
        elif offsets == "all":
            cands = list(same_vid)
        elif isinstance(offsets, (list, tuple)):
            wanted = {fid + o for o in offsets}
            cands = [i for i in same_vid if self.frame_ids(i)[1] in wanted]
        else:
            raise ValueError(f"unknown offsets grammar: {offsets!r}")
        if not cands:
            return None
        return int(cands[rng.integers(0, len(cands))])

    @staticmethod
    def gt_pids(gt_obj_ids: np.ndarray, ref_obj_ids: np.ndarray
                ) -> np.ndarray:
        """Track-id labels: 1-based index into the reference frame's
        instances, 0 = new object (reference cityscapes_vps.py:233-251)."""
        ref = list(ref_obj_ids)
        return np.asarray(
            [ref.index(i) + 1 if i in ref else 0 for i in gt_obj_ids],
            np.int64)
