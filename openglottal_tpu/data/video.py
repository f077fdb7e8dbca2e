"""Host-side video decode and colour conversion.

Video decode stays on the host (cv2/ffmpeg), feeding device-resident frame
chunks — the TPU analog of the reference's ``load_frames_bgr``
(openglottal/utils.py:43-54).  Colour conversion uses cv2's exact fixed-point
BT.601 coefficients so grayscale values match the reference bit-for-bit.
"""

from __future__ import annotations

import contextlib
import os

import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def _silence_stderr():
    """Suppress OpenCV's noisy stderr warnings (reference utils.py:29-39)."""
    devnull = os.open(os.devnull, os.O_WRONLY)
    old_fd = os.dup(2)
    os.dup2(devnull, 2)
    try:
        yield
    finally:
        os.dup2(old_fd, 2)
        os.close(old_fd)
        os.close(devnull)


def load_frames_bgr(path) -> np.ndarray:
    """Decode all frames of a video as one (T, H, W, 3) uint8 BGR array."""
    import cv2

    with _silence_stderr():
        cap = cv2.VideoCapture(str(path))
        frames = []
        while True:
            ret, frm = cap.read()
            if not ret:
                break
            frames.append(frm)
        cap.release()
    if not frames:
        return np.zeros((0, 0, 0, 3), np.uint8)
    return np.stack(frames)


def iter_frames_bgr(path, chunk: int = 512):
    """Decode a video as a stream of (n<=chunk, H, W, 3) uint8 BGR arrays.

    Bounded-memory alternative to :func:`load_frames_bgr` (which mirrors the
    reference's whole-video-into-RAM load, utils.py:43-54): feeds the
    streaming pipelines (pipelines.GlottalPipelines.stream_areas) so
    arbitrarily long 4000 fps recordings process in O(chunk) host and device
    memory while only the scalar waveform accumulates.
    """
    import cv2

    with _silence_stderr():
        cap = cv2.VideoCapture(str(path))
        try:
            frames = []
            while True:
                ret, frm = cap.read()
                if not ret:
                    break
                frames.append(frm)
                if len(frames) == chunk:
                    yield np.stack(frames)
                    frames = []
            if frames:
                yield np.stack(frames)
        finally:
            cap.release()


def bgr_to_gray_u8(frames_bgr):
    """cv2.cvtColor(BGR2GRAY) bit-exact: fixed-point BT.601.

    cv2 computes (R*4899 + G*9617 + B*1868 + (1<<13)) >> 14 on uint8.
    Works on (..., 3) arrays, jnp or numpy; returns uint8.
    """
    x = frames_bgr.astype(jnp.int32) if isinstance(frames_bgr, jnp.ndarray) \
        else frames_bgr.astype(np.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    gray = (r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14
    return gray.astype(jnp.uint8 if isinstance(frames_bgr, jnp.ndarray) else np.uint8)
