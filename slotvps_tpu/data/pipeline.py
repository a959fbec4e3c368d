"""Test-time image preprocessing, matching the reference recipe exactly.

Reference pipeline (configs/cityscapes/r50_fpn_slotvps.py:147-161):
LoadRefImageFromFile -> MultiScaleFlipAug[(2048,1024), flip=False] ->
Resize(keep_ratio) -> Normalize(mean/std, to_rgb) -> Pad(size_divisor=32).

Images are read BGR (mmcv.imread == cv2.imread), converted to RGB, scaled
with ``imrescale`` semantics (scale factor = min(max_w/w, max_h/h), new size
rounded with +0.5), normalized, zero-padded bottom/right to /32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def imrescale_size(w: int, h: int, scale: Tuple[int, int]) -> Tuple[int, int]:
    """mmcv.imrescale new size for keep_ratio resize; scale = (max_w, max_h)."""
    max_w, max_h = scale
    f = min(max_w / w, max_h / h)
    return int(w * f + 0.5), int(h * f + 0.5)


def preprocess(
    img_bgr: np.ndarray,
    scale: Tuple[int, int] = (2048, 1024),
    mean=(123.675, 116.28, 103.53),
    std=(58.395, 57.12, 57.375),
    to_rgb: bool = True,
    size_divisor: int = 32,
) -> Tuple[np.ndarray, dict]:
    """uint8 BGR HxWx3 -> normalized float32 [1, H', W', 3] + meta."""
    h, w = img_bgr.shape[:2]
    new_w, new_h = imrescale_size(w, h, scale)
    if (new_w, new_h) != (w, h):
        assert cv2 is not None, "cv2 required for resizing"
        img_bgr = cv2.resize(img_bgr, (new_w, new_h),
                             interpolation=cv2.INTER_LINEAR)
    img = img_bgr.astype(np.float32)
    if to_rgb:
        img = img[..., ::-1]
    img = (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    pad_h = (size_divisor - new_h % size_divisor) % size_divisor
    pad_w = (size_divisor - new_w % size_divisor) % size_divisor
    if pad_h or pad_w:
        img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
    meta = {
        "ori_shape": (h, w),
        "img_shape": (new_h, new_w),
        "pad_shape": img.shape[:2],
        "scale_factor": new_w / w,
    }
    return img[None].astype(np.float32), meta
