"""Utility namespace, including the reference's ``openglottal.utils``
surface (utils.py:16-241) under the same names, so ``from
openglottal_tpu.utils import letterbox, dice, unet_segment_frame, ...``
works for users porting reference code.

Host letterboxing delegates to the cv2-exact geometry in ops/resize (which
also backs the on-device matrix-resample versions used by the batched
pipelines); metrics delegate to ops/metrics (empty-and-empty = 1.0
convention pinned by tests)."""

from __future__ import annotations

import numpy as np

from openglottal_tpu.utils.io import (  # noqa: F401
    load_unet_weights,
    load_yolo_weights,
    resolve_weights_path,
    save_features_json,
)


def letterbox(img: np.ndarray, size: int = 256, value: int = 0) -> np.ndarray:
    """Aspect-preserving resize + symmetric pad to (size, size) — reference
    utils.py:66-94 (INTER_LINEAR for 3-channel, INTER_NEAREST for 2-D)."""
    from openglottal_tpu.ops.resize import letterbox_np

    return letterbox_np(img, size, value)


def letterbox_with_info(img: np.ndarray, size: int = 256, value: int = 0):
    """Letterbox + geometry (boxed, pad_top, pad_left, content_h, content_w)
    — reference utils.py:97-133."""
    from openglottal_tpu.ops.resize import letterbox_info, letterbox_np

    pt, pl, ch, cw = letterbox_info(img.shape[0], img.shape[1], size)
    return letterbox_np(img, size, value), pt, pl, ch, cw


def letterbox_apply_geometry(img: np.ndarray, size: int, pad_top: int,
                             pad_left: int, content_h: int, content_w: int,
                             value: int = 0, interp=None) -> np.ndarray:
    """Apply a previous letterbox's geometry to another array (masks) —
    reference utils.py:136-163."""
    import cv2

    if interp is None:
        interp = cv2.INTER_NEAREST if img.ndim == 2 else cv2.INTER_LINEAR
    resized = cv2.resize(img, (content_w, content_h), interpolation=interp)
    out_shape = (size, size) + img.shape[2:]
    out = np.full(out_shape, value, dtype=img.dtype)
    out[pad_top:pad_top + content_h, pad_left:pad_left + content_w] = resized
    return out


def unletterbox(letterboxed: np.ndarray, pad_top: int, pad_left: int,
                content_h: int, content_w: int, target_h: int, target_w: int,
                interp=None) -> np.ndarray:
    """Crop the content region and resize back — reference utils.py:166-186
    (default INTER_NEAREST)."""
    import cv2

    if interp is None:
        interp = cv2.INTER_NEAREST
    crop = letterboxed[pad_top:pad_top + content_h,
                       pad_left:pad_left + content_w]
    if (content_h, content_w) == (target_h, target_w):
        return crop
    return cv2.resize(crop, (target_w, target_h), interpolation=interp)


def dice(pred, gt) -> float:
    """Dice of binary masks; empty-and-empty = 1.0 (reference utils.py:191-198)."""
    from openglottal_tpu.ops import metrics

    return float(metrics.dice(np.asarray(pred), np.asarray(gt)))


def iou(pred, gt) -> float:
    """IoU of binary masks; empty union = 1.0 (reference utils.py:200-206)."""
    from openglottal_tpu.ops import metrics

    return float(metrics.iou(np.asarray(pred), np.asarray(gt)))


def dice_loss(logits, target, eps: float = 1e-6):
    """Differentiable soft-dice on logits (reference utils.py:209-213).

    JAX-differentiable (jnp scalar); torch training loops should use
    ``train.UNetTrainer`` which owns the whole recipe."""
    import jax.numpy as jnp

    from openglottal_tpu.ops.metrics import dice_loss as _dl

    return _dl(jnp.asarray(np.asarray(logits)), jnp.asarray(np.asarray(target)))


def load_frames_bgr(avi_path):
    """Decode a whole video to (T, H, W, 3) uint8 BGR (reference
    utils.py:43-54 returns a list; an array indexes/iterates the same)."""
    from openglottal_tpu.data.video import load_frames_bgr as _load

    return _load(avi_path)


def unet_segment_frame(frame_gray: np.ndarray, variables, device=None,
                       threshold: float = 0.5) -> np.ndarray:
    """Segment one (H, W) uint8 frame -> uint8 mask (255 = glottis), resized
    through 256² like the reference (utils.py:218-241).  ``variables`` is a
    flax variables dict (in place of the torch module); ``device`` is
    accepted for signature parity and ignored.  Batched videos should use
    ``models.unet.segment_frames`` / the pipelines."""
    import jax.numpy as jnp

    from openglottal_tpu.models.unet import segment_frames

    mask = segment_frames(variables, jnp.asarray(frame_gray)[None],
                          threshold=threshold)[0]
    return np.asarray(mask).astype(np.uint8) * 255


def _silence_stderr():
    """Context manager muting fd-2 (reference utils.py:29-39 — OpenCV's
    ffmpeg backend spams stderr on some AVIs).  Re-exported here for
    reference-surface parity; the implementation lives with the video IO
    that needs it (data/video.py)."""
    from openglottal_tpu.data.video import _silence_stderr as _impl

    return _impl()
