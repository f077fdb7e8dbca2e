"""Crop-mode training dataset materialisation (reference
scripts/train_unet_crop.py:75-346).

Two crop sources:
  * GT mode: tight ground-truth mask bbox + ``pad`` px each side (reference
    GTCroppedGlottisDataset, :216-346).
  * YOLO mode: detector boxes (per-frame, no temporal state — training images
    are independent frames); frames with no detection are skipped (reference
    CroppedGlottisDataset, :75-214).

Crops (image + mask) are letterboxed to 256² with the reference's geometry
(INTER_NEAREST for 2-D arrays) and cached as .npz keyed by the sha256 of the
file list + parameters (reference :54-70).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np

SIZE = 256


def _letterbox_crop(img, msk):
    import cv2

    from openglottal_tpu.ops.resize import letterbox_info

    h, w = img.shape[:2]
    pt, pl, ch, cw = letterbox_info(h, w, SIZE)
    out_i = np.zeros((SIZE, SIZE), img.dtype)
    out_m = np.zeros((SIZE, SIZE), msk.dtype)
    out_i[pt:pt + ch, pl:pl + cw] = cv2.resize(img, (cw, ch),
                                               interpolation=cv2.INTER_NEAREST)
    out_m[pt:pt + ch, pl:pl + cw] = cv2.resize(msk, (cw, ch),
                                               interpolation=cv2.INTER_NEAREST)
    return out_i, out_m


def materialize_gt_crops(fnames, img_dir, lbl_dir, pad: int = 8,
                         label_suffix: str = "", cache_dir=None):
    """GT-bbox crops: tight mask bbox + pad (train_unet_crop.py:216-346).

    Returns (images (N,256,256) u8, masks (N,256,256) u8); empty-mask frames
    are skipped.
    """
    import cv2

    if cache_dir is not None:
        key = hashlib.sha256(json.dumps(
            [sorted(fnames), str(img_dir), str(lbl_dir), pad, label_suffix,
             "gt"]).encode()).hexdigest()[:16]
        cache = Path(cache_dir) / f"crops_gt_{key}.npz"
        if cache.exists():
            z = np.load(cache)
            return z["images"], z["masks"]

    img_dir, lbl_dir = Path(img_dir), Path(lbl_dir)
    images, masks = [], []
    for fname in fnames:
        stem = Path(fname).stem
        lbl = f"{stem}{label_suffix}.png" if label_suffix else fname
        img = cv2.imread(str(img_dir / fname), cv2.IMREAD_GRAYSCALE)
        msk = cv2.imread(str(lbl_dir / lbl), cv2.IMREAD_GRAYSCALE)
        if img is None or msk is None or msk.max() == 0:
            continue
        ys, xs = np.nonzero(msk > 0)
        h, w = img.shape
        y1, y2 = max(0, ys.min() - pad), min(h, ys.max() + 1 + pad)
        x1, x2 = max(0, xs.min() - pad), min(w, xs.max() + 1 + pad)
        ci, cm = _letterbox_crop(img[y1:y2, x1:x2], msk[y1:y2, x1:x2])
        images.append(ci)
        masks.append((cm > 0).astype(np.uint8))
    images = np.stack(images) if images else np.zeros((0, SIZE, SIZE), np.uint8)
    masks = np.stack(masks) if masks else np.zeros((0, SIZE, SIZE), np.uint8)

    if cache_dir is not None:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        np.savez_compressed(cache, images=images, masks=masks)
    return images, masks


def materialize_yolo_crops(fnames, img_dir, lbl_dir, pipe,
                           label_suffix: str = "", cache_dir=None,
                           batch: int = 256):
    """YOLO-ROI crops: per-frame stateless detection (gate geometry without
    temporal state), no-detection frames skipped (train_unet_crop.py:75-214).

    ``pipe``: a GlottalPipelines with yolo_variables set.
    """
    import cv2

    if cache_dir is not None:
        key = hashlib.sha256(json.dumps(
            [sorted(fnames), str(img_dir), str(lbl_dir), label_suffix,
             float(pipe.conf), "yolo"]).encode()).hexdigest()[:16]
        cache = Path(cache_dir) / f"crops_yolo_{key}.npz"
        if cache.exists():
            z = np.load(cache)
            return z["images"], z["masks"]

    from openglottal_tpu.data.dataset import materialize_split

    # full frames letterboxed to 256² first (detector input size)
    frames, gts = materialize_split(fnames, img_dir, lbl_dir, label_suffix,
                                    cache_dir=cache_dir)
    import jax

    images, masks = [], []
    for i in range(0, len(frames), batch):
        chunk = frames[i:i + batch]
        valid, boxes = pipe._gated(None, jax.device_put(chunk),
                                   sequential=False)
        valid, boxes = np.asarray(valid), np.asarray(boxes)
        for j in range(len(chunk)):
            if not valid[j]:
                continue  # skip no-detection frames (reference :120-127)
            x1, y1, x2, y2 = boxes[j]
            if x2 <= x1 or y2 <= y1:
                continue
            ci, cm = _letterbox_crop(chunk[j, y1:y2, x1:x2],
                                     gts[i + j, y1:y2, x1:x2])
            images.append(ci)
            masks.append((cm > 0).astype(np.uint8))
    images = np.stack(images) if images else np.zeros((0, SIZE, SIZE), np.uint8)
    masks = np.stack(masks) if masks else np.zeros((0, SIZE, SIZE), np.uint8)

    if cache_dir is not None:
        np.savez_compressed(cache, images=images, masks=masks)
    return images, masks


def materialize_gt_crops_arrays(gray_u8: np.ndarray, masks: np.ndarray,
                                pad: int = 8):
    """GT-bbox crops from in-memory arrays (the integration gate's path —
    selftest trains a crop U-Net without touching disk; same geometry as
    :func:`materialize_gt_crops`, reference train_unet_crop.py:216-346).

    gray_u8: (N, H, W) uint8; masks: (N, H, W) {0,1}.  Empty-mask frames
    are skipped.  Returns (images (M,256,256) u8, masks (M,256,256) u8).
    """
    images, out_masks = [], []
    for img, msk in zip(np.asarray(gray_u8), np.asarray(masks)):
        if msk.max() == 0:
            continue
        ys, xs = np.nonzero(msk > 0)
        h, w = img.shape
        y1, y2 = max(0, ys.min() - pad), min(h, ys.max() + 1 + pad)
        x1, x2 = max(0, xs.min() - pad), min(w, xs.max() + 1 + pad)
        ci, cm = _letterbox_crop(img[y1:y2, x1:x2],
                                 msk[y1:y2, x1:x2].astype(np.uint8))
        images.append(ci)
        out_masks.append((cm > 0).astype(np.uint8))
    images = np.stack(images) if images else np.zeros((0, SIZE, SIZE), np.uint8)
    out_masks = (np.stack(out_masks) if out_masks
                 else np.zeros((0, SIZE, SIZE), np.uint8))
    return images, out_masks
