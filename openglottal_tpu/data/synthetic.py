"""Synthetic HSV-like test videos: a pulsating dark ellipse ("glottis") on a
bright textured background.  Enables end-to-end pipeline and training tests
without the 3.5 GB GIRAFE/BAGLS downloads (SURVEY.md §4d)."""

from __future__ import annotations

import numpy as np


def synthetic_video(
    t: int = 64,
    size: int = 256,
    f0_cycles_per_frame: float = 0.05,
    center=(128.0, 128.0),
    drift_px: float = 0.2,
    seed: int = 0,
    realistic: bool = False,
):
    """Returns (frames_bgr (T, S, S, 3) uint8, gt_masks (T, S, S) bool).

    The ellipse's area pulses sinusoidally at ``f0_cycles_per_frame`` (the
    GAW ground truth), with a slow centre drift to exercise the gate's
    drift clamp.  ``realistic=True`` adds endoscopy-like structure: fold
    texture, radial vignette, a moving specular highlight, and per-frame
    sensor noise — a harder proxy for GIRAFE footage.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:size, :size].astype(np.float32)
    base = (rng.normal(170, 12, (size, size)).clip(0, 255)).astype(np.float32)

    vignette = spec_cx = spec_cy = None
    if realistic:
        # low-frequency tissue texture + folds radiating from the glottis
        lowfreq = rng.normal(0, 1, (size // 16, size // 16))
        import cv2

        tex = cv2.resize(lowfreq, (size, size), interpolation=cv2.INTER_CUBIC)
        ang = np.arctan2(yy - center[0], xx - center[1])
        folds = 10.0 * np.cos(6.0 * ang)
        base = (base + 18.0 * tex + folds).clip(0, 255)
        r2 = ((yy - size / 2) ** 2 + (xx - size / 2) ** 2) / (size / 2) ** 2
        vignette = 1.0 - 0.45 * r2.clip(0, 1)
        spec_cy, spec_cx = rng.uniform(0.2 * size, 0.8 * size, 2)

    frames = np.empty((t, size, size, 3), np.uint8)
    masks = np.empty((t, size, size), bool)
    cy, cx = center
    for i in range(t):
        phase = 2 * np.pi * f0_cycles_per_frame * i
        open_frac = 0.5 * (1 - np.cos(phase))  # 0 (closed) .. 1 (open)
        ry = 6 + 26 * open_frac
        rx = 3 + 9 * open_frac
        cy += rng.normal(0, drift_px)
        cx += rng.normal(0, drift_px)
        e = (((yy - cy) / max(ry, 1e-3)) ** 2 + ((xx - cx) / max(rx, 1e-3)) ** 2) < 1
        img = base.copy()
        img[e] = rng.normal(35, 8, e.sum()).clip(0, 255)
        if realistic:
            spec_cy += rng.normal(0, 0.8)
            spec_cx += rng.normal(0, 0.8)
            spec = 70.0 * np.exp(-(((yy - spec_cy) / 22.0) ** 2
                                   + ((xx - spec_cx) / 22.0) ** 2))
            img = (img * vignette + spec
                   + rng.normal(0, 4, (size, size))).clip(0, 255)
        g = img.astype(np.uint8)
        frames[i] = np.stack([g, g, g], -1)
        masks[i] = e
    return frames, masks


def synthetic_gt_boxes(masks: np.ndarray, dilate: int = 0):
    """Tight (x1, y1, x2, y2) boxes of GT masks; rows of -1 when empty."""
    t, h, w = masks.shape
    boxes = np.full((t, 4), -1, np.float32)
    for i in range(t):
        ys, xs = np.nonzero(masks[i])
        if len(ys):
            boxes[i] = [max(0, xs.min() - dilate), max(0, ys.min() - dilate),
                        min(w, xs.max() + 1 + dilate), min(h, ys.max() + 1 + dilate)]
    return boxes
