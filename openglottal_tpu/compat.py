"""Reference-compatible API surface.

The reference package root exports (openglottal/__init__.py:5-20):
``TemporalDetector, VocalFoldTracker, YOLOGuidedVFT, UNet,
extract_features_detector, extract_features_yolo_guided_vft,
extract_features_unet``.  This module provides the same names with the same
call signatures so reference users can switch imports; internally everything
runs the batched TPU pipelines.

``TemporalDetector`` here is a host-side convenience object bundling YOLO
weights + gate parameters (the reference couples model and gate in one class,
detector.py:9-102); the pipelines consume its fields.  A per-frame
``detect()`` is provided for drop-in compatibility but batched use is the
intended path.
"""

from __future__ import annotations

import numpy as np

from openglottal_tpu.features import kinematic_features  # noqa: F401
from openglottal_tpu.models.gate import GateParams
from openglottal_tpu.models.tracker import VFTParams as VocalFoldTracker  # noqa: F401
from openglottal_tpu.models.tracker import YGVFTParams as YOLOGuidedVFT  # noqa: F401
from openglottal_tpu.models.unet import UNet  # noqa: F401


class TemporalDetector:
    """Reference-compatible detector handle (detector.py:9-102).

    model_path: orbax checkpoint dir (or torch .pt via utils.torch_import
    for U-Net-style weights).  Keeps the reference's constructor signature.
    """

    def __init__(self, model_path, conf: float = 0.25, max_shift_px: int = 30,
                 padding: int = 8, max_hold_frames: int = 3):
        from openglottal_tpu.utils.io import load_yolo_weights

        self.variables = load_yolo_weights(model_path)
        self.conf = conf
        self.params = GateParams(float(max_shift_px), int(padding),
                                 int(max_hold_frames))
        self.reset()

    def reset(self) -> None:
        from openglottal_tpu.models.gate import gate_init

        self._state = gate_init()

    def detect(self, frame_bgr: np.ndarray):
        """Per-frame drop-in API (sequential; batched use is preferred —
        see GlottalPipelines.gated_boxes)."""
        import jax.numpy as jnp

        from openglottal_tpu.models.gate import gate_step
        from openglottal_tpu.models.yolo import YOLOv8, max_conf_detect

        h, w = frame_bgr.shape[:2]
        x = jnp.asarray(frame_bgr[None, ..., ::-1].astype(np.float32) / 255.0)
        model = YOLOv8(nc=1)
        outs = model.apply(self.variables, x, train=False)
        has, box, conf = max_conf_detect(outs, h, w, self.conf)
        self._state, (valid, obox) = gate_step(
            self._state, (has[0], box[0, 0], box[0, 1], box[0, 2], box[0, 3]),
            h, w, self.params)
        if not bool(valid):
            return None
        return tuple(int(v) for v in np.asarray(obox))

    def _pipelines(self, unet_variables=None, crop_unet_variables=None):
        from openglottal_tpu.pipelines import GlottalPipelines

        return GlottalPipelines(
            unet_variables=unet_variables,
            crop_unet_variables=crop_unet_variables,
            yolo_variables=self.variables, conf=self.conf,
            gate_params=self.params)


def _load_video(avi_path):
    from openglottal_tpu.data.video import load_frames_bgr

    return load_frames_bgr(avi_path)


def extract_features_detector(avi_path, detector: TemporalDetector,
                              vft_init: int = 2):
    """Pipeline 1 (reference features.py:74-141)."""
    frames = _load_video(avi_path)
    pipe = detector._pipelines()
    return pipe.extract_features(frames, "vft")


def extract_features_yolo_guided_vft(avi_path, detector: TemporalDetector,
                                     ygvft_init: int = 2):
    """Pipeline 2 (reference features.py:147-196)."""
    frames = _load_video(avi_path)
    pipe = detector._pipelines()
    return pipe.extract_features(frames, "guided-vft")


def extract_features_unet(avi_path, detector: TemporalDetector | None,
                          model_variables, device=None):
    """Pipeline 3 / U-Net-only (reference features.py:202-247).

    ``device`` is accepted for signature parity and ignored (placement is
    JAX's job)."""
    frames = _load_video(avi_path)
    if detector is None:
        from openglottal_tpu.pipelines import GlottalPipelines

        pipe = GlottalPipelines(unet_variables=model_variables)
        return pipe.extract_features(frames, "unet-only")
    pipe = detector._pipelines(unet_variables=model_variables)
    return pipe.extract_features(frames, "unet")
