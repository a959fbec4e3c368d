"""Train-time data transforms — the reference's released train pipeline.

Reference pipeline (configs/cityscapes/r50_fpn_slotvps.py:123-146):
  Resize(img_scale=(2048,1024), keep_ratio, ratio_range=(0.8,1.5)) ->
  RandomFlip(0.5) -> Normalize -> RandomCrop(800,1600) -> Pad(/32) ->
  SegResizeFlipCropPadRescale([1, 0.25]) -> FixedImageRandomShift

Each transform is a pure numpy/cv2 function mirroring the reference's
semantics (mmdet/datasets/pipelines/transforms.py: Resize :15, RandomFlip
:704, RandomCrop :906, Pad :780, SegResizeFlipCropPadRescale :1049,
FixedImageRandomShift :247, PhotoMetricDistortion :1201).  The driver
``apply_train_pipeline`` reproduces the order and the joint handling of the
current frame, reference frame(s), boxes, masks, and semantic maps.

One deliberate divergence: the reference pads the semantic map with 0
(mmcv.impad default), leaking class-0 labels into padded rows; we pad with
the ignore label 255 (only reachable when the crop is not /32-aligned —
never with the default (800, 1600) crop).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclasses.dataclass
class TrainAugConfig:
    """Knobs of the reference train pipeline (r50_fpn_slotvps.py:123-146)."""

    img_scale: Tuple[int, int] = (2048, 1024)   # (w, h) budget
    ratio_range: Tuple[float, float] = (0.8, 1.5)
    flip_ratio: float = 0.5
    crop_size: Tuple[int, int] = (800, 1600)    # (h, w)
    size_divisor: int = 32
    seg_scale: float = 0.25
    shift_padding: int = 50
    photometric: bool = False                   # not in the released config
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    to_rgb: bool = True
    ignore_label: int = 255


@dataclasses.dataclass
class FrameGT:
    """Per-frame ground truth carried through the pipeline."""

    bboxes: np.ndarray            # [N, 4] float32 x1y1x2y2
    labels: np.ndarray            # [N] int64 (1-based thing class)
    obj_ids: np.ndarray           # [N] int64 track/instance ids
    masks: List[np.ndarray]       # N binary [H, W] uint8
    semantic: Optional[np.ndarray] = None  # [H, W] uint8/int label map

    def select(self, keep: np.ndarray) -> "FrameGT":
        idx = np.where(keep)[0]
        return FrameGT(
            bboxes=self.bboxes[keep],
            labels=self.labels[keep],
            obj_ids=self.obj_ids[keep],
            masks=[self.masks[i] for i in idx],
            semantic=self.semantic,
        )


def rescale_factor(h: int, w: int, scale: Tuple[int, int]) -> float:
    """mmcv.imrescale tuple semantics: scale bounds the (long, short) edges
    regardless of tuple order."""
    long_edge, short_edge = max(scale), min(scale)
    return min(long_edge / max(h, w), short_edge / min(h, w))


def imrescale(img: np.ndarray, scale, interpolation="bilinear"):
    """mmcv.imrescale: float scale factor or (edge, edge) tuple; new size is
    ``int(dim * f + 0.5)``.  Returns (resized, f)."""
    h, w = img.shape[:2]
    f = scale if isinstance(scale, (int, float)) \
        else rescale_factor(h, w, scale)
    new_w, new_h = int(w * f + 0.5), int(h * f + 0.5)
    interp = {"bilinear": cv2.INTER_LINEAR,
              "nearest": cv2.INTER_NEAREST}[interpolation]
    return cv2.resize(img, (new_w, new_h), interpolation=interp), f


def bbox_flip(bboxes: np.ndarray, width: int) -> np.ndarray:
    """mmcv horizontal bbox flip: x' = w - x - 1."""
    out = bboxes.copy()
    out[:, 0] = width - bboxes[:, 2] - 1
    out[:, 2] = width - bboxes[:, 0] - 1
    return out


def photometric_distortion(img_bgr: np.ndarray, rng,
                           ref_bgr: np.ndarray = None,
                           brightness_delta=32,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5),
                           hue_delta=18,
                           no_swap_channel=False,
                           convert_uint8=True):
    """PhotoMetricDistortion (reference transforms.py:1201-1385): random
    brightness / contrast (before or after HSV) / saturation / hue /
    channel-swap on the unnormalized BGR image, each with p=0.5.

    Matches the reference's float pipeline: the image stays float32 through
    the BGR<->HSV round trip (cv2 CV_32F: H in [0, 360), S in [0, 1]) with
    no intermediate uint8 quantization; hue wraps at 360 by a single
    +-360 correction.  When ``ref_bgr`` is given the SAME random draws are
    applied to it (the reference applies identical deltas to 'ref_img');
    returns (img, ref) then, else img alone.
    """
    imgs = [img_bgr.astype(np.float32)]
    if ref_bgr is not None:
        imgs.append(ref_bgr.astype(np.float32))
    if rng.integers(2):
        delta = rng.uniform(-brightness_delta, brightness_delta)
        imgs = [im + delta for im in imgs]
    mode = rng.integers(2)
    if mode == 1 and rng.integers(2):
        alpha = rng.uniform(*contrast_range)
        imgs = [im * alpha for im in imgs]
    imgs = [cv2.cvtColor(im, cv2.COLOR_BGR2HSV) for im in imgs]
    if rng.integers(2):
        satu = rng.uniform(*saturation_range)
        for im in imgs:
            im[..., 1] *= satu
    if rng.integers(2):
        hue = rng.uniform(-hue_delta, hue_delta)
        for im in imgs:
            im[..., 0] += hue
            im[..., 0][im[..., 0] > 360] -= 360
            im[..., 0][im[..., 0] < 0] += 360
    imgs = [cv2.cvtColor(im, cv2.COLOR_HSV2BGR) for im in imgs]
    if mode == 0 and rng.integers(2):
        alpha = rng.uniform(*contrast_range)
        imgs = [im * alpha for im in imgs]
    if not no_swap_channel and rng.integers(2):
        perm = rng.permutation(3)
        imgs = [im[..., perm] for im in imgs]
    if convert_uint8:
        imgs = [im.astype(np.uint8) for im in imgs]
    return imgs[0] if ref_bgr is None else (imgs[0], imgs[1])


def _resize_frame(img, gt: FrameGT, f: float, shape_after):
    img2, _ = imrescale(img, f)
    bboxes = gt.bboxes * f
    h2, w2 = img2.shape[:2]
    bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, w2 - 1)
    bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, h2 - 1)
    masks = [imrescale(m, f, "nearest")[0] for m in gt.masks]
    return img2, dataclasses.replace(gt, bboxes=bboxes, masks=masks)


def _crop_frame(img, gt: FrameGT, coords) -> Optional[Tuple]:
    y1, y2, x1, x2 = coords
    img2 = img[y1:y2, x1:x2]
    h2, w2 = img2.shape[:2]
    bboxes = gt.bboxes - np.array([x1, y1, x1, y1], np.float32)
    bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, w2 - 1)
    bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, h2 - 1)
    valid = (bboxes[:, 2] > bboxes[:, 0]) & (bboxes[:, 3] > bboxes[:, 1])
    if not valid.any():
        return None
    gt2 = dataclasses.replace(gt, bboxes=bboxes,
                              masks=[m[y1:y2, x1:x2] for m in gt.masks])
    gt2 = gt2.select(valid)
    return img2, gt2


def _pad(img, divisor, value=0.0):
    h, w = img.shape[:2]
    ph = (divisor - h % divisor) % divisor
    pw = (divisor - w % divisor) % divisor
    if not (ph or pw):
        return img
    widths = ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2)
    return np.pad(img, widths, constant_values=value)


def _replay_on_seg(seg, f, flip, crop_coords, pad_shape, seg_scale,
                   ignore_label):
    """SegResizeFlipCropPadRescale (reference transforms.py:1049-1141):
    replay resize(nearest)/flip/crop/pad on the label map, then produce the
    1/4-scale copy."""
    seg2, _ = imrescale(seg, f, "nearest")
    if flip:
        seg2 = seg2[:, ::-1]
    y1, y2, x1, x2 = crop_coords
    seg2 = seg2[y1:y2, x1:x2]
    if seg2.shape[:2] != tuple(pad_shape):
        out = np.full(pad_shape, ignore_label, seg2.dtype)
        out[:seg2.shape[0], :seg2.shape[1]] = seg2
        seg2 = out
    seg_nx, _ = imrescale(seg2, seg_scale, "nearest")
    return np.ascontiguousarray(seg2), np.ascontiguousarray(seg_nx)


def fixed_image_random_shift(img, gt: FrameGT, seg, rng,
                             padding=50) -> Optional[Tuple]:
    """FixedImageRandomShift (reference transforms.py:247-412): turn a
    static copy into a pseudo-video frame by cropping a shifted window and
    rescaling it back to the original size; boxes/masks/seg follow."""
    h, w = img.shape[:2]
    xshift = int(padding * rng.random()) + 1
    xshift *= 1 if rng.standard_normal() > 0 else -1
    yshift = int(padding * rng.random()) + 1
    yshift *= 1 if rng.standard_normal() > 0 else -1

    ymin = int(max(0, -yshift))
    ymax = int(min(h, h - yshift))
    xmin = int(max(0, -xshift))
    xmax = int(min(w, w - xshift))
    ratio = max(w // h, 1)
    xmax = xmin + (ymax - ymin) * ratio
    if xmax > w:
        xmax = w
        if (xmax - xmin) % 2 != 0:
            xmax -= 1
        ymax = ymin + (xmax - xmin) // ratio

    crop = img[ymin:ymax, xmin:xmax]
    ch, cw = crop.shape[:2]
    img2, f = imrescale(crop, (h, w))

    bboxes = gt.bboxes - np.array([xmin, ymin, xmin, ymin], np.float32)
    bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, cw - 1)
    bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, ch - 1)
    valid = (bboxes[:, 2] > bboxes[:, 0]) & (bboxes[:, 3] > bboxes[:, 1])
    if not valid.any():
        return None
    bboxes = bboxes * f
    bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, img2.shape[1] - 1)
    bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, img2.shape[0] - 1)
    gt2 = dataclasses.replace(
        gt, masks=[m[ymin:ymax, xmin:xmax] for m in gt.masks])
    gt2 = gt2.select(valid)
    gt2 = dataclasses.replace(
        gt2, bboxes=bboxes[valid],
        masks=[imrescale(m, f, "nearest")[0] for m in gt2.masks])

    seg2 = None
    if seg is not None:
        seg2, _ = imrescale(seg[ymin:ymax, xmin:xmax], f, "nearest")
    # the rescaled window can be 1px off the original size (mmcv rounding);
    # clip/pad to keep the pair stackable
    if img2.shape[:2] != (h, w):
        img2 = _pad(img2[:h, :w], max(h, w))[:h, :w]
        if seg2 is not None:
            out = np.full((h, w), 255, seg2.dtype)
            s = seg2[:h, :w]
            out[:s.shape[0], :s.shape[1]] = s
            seg2 = out
        gt2 = dataclasses.replace(
            gt2, masks=[_pad(m[:h, :w], max(h, w))[:h, :w]
                        for m in gt2.masks])
    return img2, gt2, seg2


def gt_pids_from_obj_ids(gt_obj_ids: Sequence[int],
                         ref_obj_ids: Sequence[int]) -> np.ndarray:
    """Track-id labels: 1-based index into the reference frame's surviving
    instances, 0 = new object (reference cityscapes_vps.py:246-248)."""
    ref = list(ref_obj_ids)
    return np.asarray(
        [ref.index(i) + 1 if i in ref else 0 for i in gt_obj_ids], np.int64)


def apply_train_pipeline(
    img: np.ndarray,                 # current frame, uint8 BGR
    gt: FrameGT,                     # with .semantic set (label map)
    ref_img: Optional[np.ndarray],   # reference frame or None (= static)
    ref_gt: Optional[FrameGT],
    aug: TrainAugConfig,
    rng: np.random.Generator,
    pseudo_video: bool = False,      # True = ref is a copy; shift it
) -> Optional[Dict]:
    """Run the full reference train pipeline on one (cur, ref) pair.

    Returns None when a crop/shift leaves a frame with no GT (the reference
    resamples another index, datasets/custom.py:138-146)."""
    if ref_img is None:
        ref_img, ref_gt = img, gt
        pseudo_video = True

    if aug.photometric:
        if pseudo_video:
            img = photometric_distortion(img, rng)
            ref_img = img
        else:
            img, ref_img = photometric_distortion(img, rng, ref_img)

    # 1. Resize: one random ratio shared by both frames
    ratio = rng.random() * (aug.ratio_range[1] - aug.ratio_range[0]) \
        + aug.ratio_range[0]
    scale = (int(aug.img_scale[0] * ratio), int(aug.img_scale[1] * ratio))
    f = rescale_factor(img.shape[0], img.shape[1], scale)
    img, gt = _resize_frame(img, gt, f, None)
    ref_img, ref_gt = _resize_frame(ref_img, ref_gt, f, None)

    # 2. RandomFlip: one coin shared by both frames
    flip = rng.random() < aug.flip_ratio
    if flip:
        w_now = img.shape[1]
        img = img[:, ::-1]
        ref_img = ref_img[:, ::-1]
        gt = dataclasses.replace(gt, bboxes=bbox_flip(gt.bboxes, w_now),
                                 masks=[m[:, ::-1] for m in gt.masks])
        ref_gt = dataclasses.replace(
            ref_gt, bboxes=bbox_flip(ref_gt.bboxes, w_now),
            masks=[m[:, ::-1] for m in ref_gt.masks])

    # 3. Normalize
    mean = np.asarray(aug.mean, np.float32)
    std = np.asarray(aug.std, np.float32)

    def norm(im):
        im = im.astype(np.float32)
        if aug.to_rgb:
            im = im[..., ::-1]
        return (im - mean) / std

    img = norm(img)
    ref_img = norm(ref_img)

    # 4. RandomCrop: one offset shared by both frames
    ch, cw = aug.crop_size
    margin_h = max(img.shape[0] - ch, 0)
    margin_w = max(img.shape[1] - cw, 0)
    oy = int(rng.integers(0, margin_h + 1))
    ox = int(rng.integers(0, margin_w + 1))
    coords = (oy, oy + ch, ox, ox + cw)
    cur = _crop_frame(img, gt, coords)
    ref = _crop_frame(ref_img, ref_gt, coords)
    if cur is None or ref is None:
        return None
    img, gt = cur
    ref_img, ref_gt = ref

    # 5. Pad to /32
    img = _pad(img, aug.size_divisor)
    ref_img = _pad(ref_img, aug.size_divisor)
    pad_shape = img.shape[:2]
    gt = dataclasses.replace(
        gt, masks=[_pad(m, aug.size_divisor) for m in gt.masks])
    ref_gt = dataclasses.replace(
        ref_gt, masks=[_pad(m, aug.size_divisor) for m in ref_gt.masks])

    # 6. Replay on the semantic map + 1/4-scale copy
    seg = seg_nx = None
    if gt.semantic is not None:
        seg, seg_nx = _replay_on_seg(gt.semantic, f, flip, coords,
                                     pad_shape, aug.seg_scale,
                                     aug.ignore_label)
    ref_seg = None
    if ref_gt.semantic is not None:
        ref_seg, _ = _replay_on_seg(ref_gt.semantic, f, flip, coords,
                                    pad_shape, aug.seg_scale,
                                    aug.ignore_label)

    # 7. Pseudo-video: shift the reference copy
    if pseudo_video:
        shifted = fixed_image_random_shift(ref_img, ref_gt, ref_seg, rng,
                                           padding=aug.shift_padding)
        if shifted is None:
            return None
        ref_img, ref_gt, ref_seg = shifted

    gt_pids = gt_pids_from_obj_ids(gt.obj_ids, ref_gt.obj_ids)

    return dict(
        img=np.ascontiguousarray(img),
        ref_img=np.ascontiguousarray(ref_img),
        gt=gt, ref_gt=ref_gt, gt_pids=gt_pids,
        gt_semantic_seg=seg, gt_semantic_seg_nx=seg_nx,
        ref_semantic_seg=ref_seg,
        flip=flip, scale_factor=f, crop_coords=coords,
    )
