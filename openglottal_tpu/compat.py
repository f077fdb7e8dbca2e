"""Reference-compatible API surface.

The reference package root exports (openglottal/__init__.py:5-20):
``TemporalDetector, VocalFoldTracker, YOLOGuidedVFT, UNet,
extract_features_detector, extract_features_yolo_guided_vft,
extract_features_unet``.  This module provides the same names with the same
call signatures so reference users can switch imports; internally everything
runs the batched TPU pipelines.

``TemporalDetector`` here is a host-side convenience object bundling YOLO
weights + gate parameters (the reference couples model and gate in one class,
detector.py:9-102); the pipelines consume its fields.  Per-frame ``detect()``
/ ``process_frame()`` APIs are provided for drop-in compatibility but the
batched pipelines are the intended path — per-frame dispatch through the TPU
tunnel is orders of magnitude slower than one fused whole-video call.
"""

from __future__ import annotations

import numpy as np

from openglottal_tpu.features import kinematic_features  # noqa: F401
from openglottal_tpu.models.gate import GateParams
from openglottal_tpu.models.tracker import (
    VFTParams,
    YGVFTParams,
    vft_initialize,
    vft_step,
    ygvft_initialize,
    ygvft_step,
)
from openglottal_tpu.models.unet import UNet  # noqa: F401


def _resize_to(frame: np.ndarray, w: int, h: int) -> np.ndarray:
    """Resize only if the size differs (reference utils.py:57-61)."""
    if frame.shape[1] == w and frame.shape[0] == h:
        return frame
    import cv2

    return cv2.resize(frame, (w, h), interpolation=cv2.INTER_LINEAR)


class VocalFoldTracker:
    """Drop-in stateful wrapper over the jitted VFT step functions.

    Reference API (tracker.py:11-114): ``initialize(frames)`` seeds the
    motion map and intensity threshold from grayscale frames (all normalised
    to the FIRST frame's size, tracker.py:81-83); ``process_frame(frame)``
    returns a binary uint8 mask (255 = glottis).  Batched videos should use
    ``GlottalPipelines.vft_areas`` / ``models.tracker.vft_parallel`` instead —
    this class exists for reference users porting per-frame loops.
    """

    def __init__(self, alpha: float = 0.98, beta: float = 0.7,
                 roi_threshold_ratio: float = 0.07, gaussian_ksize: int = 13,
                 glottal_percentile: int = 5, max_glottal_components: int = 2):
        self.params = VFTParams(
            float(alpha), float(beta), float(roi_threshold_ratio),
            int(gaussian_ksize), float(glottal_percentile),
            int(max_glottal_components))
        self._carry = None
        self._w = self._h = None

    def initialize(self, frames) -> None:
        import jax
        import jax.numpy as jnp

        self._h, self._w = np.asarray(frames[0]).shape[:2]
        ff = np.stack([
            _resize_to(np.asarray(f), self._w, self._h).astype(np.float32)
            for f in frames])
        self._carry = jax.jit(vft_initialize, static_argnums=1)(
            jnp.asarray(ff), self.params)

    def process_frame(self, frame: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        f = _resize_to(np.asarray(frame), self._w, self._h).astype(np.float32)
        self._carry, mask = jax.jit(vft_step, static_argnums=2)(
            self._carry, jnp.asarray(f), self.params)
        return np.asarray(mask).astype(np.uint8) * 255

    # state views matching the reference attribute names
    @property
    def prev(self):
        return None if self._carry is None else np.asarray(self._carry[0])

    @property
    def lmap(self):
        return None if self._carry is None else np.asarray(self._carry[1])

    @property
    def thresh(self):
        return None if self._carry is None else float(self._carry[2])


class YOLOGuidedVFT:
    """Drop-in stateful wrapper over the jitted YOLO-guided VFT steps
    (reference tracker.py:117-232): the YOLO bbox replaces the motion-map
    ROI; ``bbox=None`` produces an empty mask for that frame."""

    def __init__(self, alpha: float = 0.98, beta: float = 0.7,
                 glottal_percentile: int = 5, gaussian_ksize: int = 13,
                 max_glottal_components: int = 2):
        self.params = YGVFTParams(
            float(alpha), float(beta), float(glottal_percentile),
            int(gaussian_ksize), int(max_glottal_components))
        self._carry = None

    def initialize(self, frames, bbox=None) -> None:
        import jax
        import jax.numpy as jnp

        ff = jnp.asarray(np.stack([np.asarray(f).astype(np.float32)
                                   for f in frames]))
        valid = jnp.asarray(bbox is not None)
        box = jnp.asarray([0, 0, 0, 0] if bbox is None
                          else [int(v) for v in bbox], jnp.int32)
        self._carry = jax.jit(ygvft_initialize, static_argnums=3)(
            ff, valid, box, self.params)

    def process_frame(self, frame: np.ndarray, bbox=None) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        f = jnp.asarray(np.asarray(frame).astype(np.float32))
        valid = jnp.asarray(bbox is not None)
        box = jnp.asarray([0, 0, 0, 0] if bbox is None
                          else [int(v) for v in bbox], jnp.int32)
        self._carry, mask = jax.jit(ygvft_step, static_argnums=4)(
            self._carry, f, valid, box, self.params)
        return np.asarray(mask).astype(np.uint8) * 255

    @property
    def prev(self):
        return None if self._carry is None else np.asarray(self._carry[0])

    @property
    def lmap(self):
        return None if self._carry is None else np.asarray(self._carry[1])

    @property
    def thresh(self):
        return None if self._carry is None else float(self._carry[2])


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

    @property
    def crop_size(self):
        """(w, h) of the current crop, or None before/after a detection is
        held (reference detector.py:47-50)."""
        if not bool(self._state.valid):
            return None
        return (int(self._state.w), int(self._state.h))

    def crop(self, frame: np.ndarray, box):
        """Slice the detected box out of the frame; the whole frame when
        box is None (reference detector.py:98-102)."""
        if box is None:
            return frame
        x1, y1, x2, y2 = box
        return frame[y1:y2, x1:x2]

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


class GlottisDataset:
    """Drop-in indexable dataset matching the reference class
    (openglottal/models/unet.py:91-192): grayscale PNG frames + binary masks
    letterboxed to 256², optional train-time augmentation.

    Returns torch float tensors (1, 256, 256) like the reference, so
    existing ``DataLoader`` training loops work unchanged (numpy arrays when
    torch is unavailable).  Augmentation runs through this framework's fused
    augmentation chain (data/augment.py — statistical parity with the
    reference's torchvision chain, pinned by tests/test_augment.py), seeded
    per-dataset instead of the reference's unseeded ``random``.  Batched TPU
    training should use ``data.dataset.materialize_split`` +
    ``train.UNetTrainer`` instead — per-item loading is the reference's
    bottleneck, not ours.
    """

    SIZE = 256

    def __init__(self, fnames, img_dir, lbl_dir, augment: bool = False,
                 label_suffix: str = "", seed: int = 0):
        from pathlib import Path

        self.fnames = list(fnames)
        self.img_dir = Path(img_dir)
        self.lbl_dir = Path(lbl_dir)
        self.augment = augment
        self.label_suffix = label_suffix
        import jax

        self._key = jax.random.PRNGKey(seed)

    def __len__(self) -> int:
        return len(self.fnames)

    def __getitem__(self, idx: int):
        import cv2
        from pathlib import Path

        from openglottal_tpu.data.dataset import _letterbox_pair

        fname = self.fnames[idx]
        stem = Path(fname).stem
        lbl = f"{stem}{self.label_suffix}.png" if self.label_suffix else fname
        img = cv2.imread(str(self.img_dir / fname), cv2.IMREAD_GRAYSCALE)
        msk = cv2.imread(str(self.lbl_dir / lbl), cv2.IMREAD_GRAYSCALE)
        if img is None or msk is None:
            raise FileNotFoundError(f"missing image or mask: {fname} / {lbl}")
        img, msk = _letterbox_pair(img, msk)
        x = img.astype(np.float32) / 255.0
        y = (msk > 0).astype(np.float32)

        if self.augment:
            import jax
            import jax.numpy as jnp

            from openglottal_tpu.data.augment import augment_batch

            self._key, k = jax.random.split(self._key)
            xa, ya = augment_batch(k, jnp.asarray(x)[None], jnp.asarray(y)[None])
            x, y = np.asarray(xa[0]), np.asarray(ya[0])

        try:
            import torch

            return (torch.from_numpy(x).unsqueeze(0),
                    torch.from_numpy(y).unsqueeze(0))
        except ImportError:
            return x[None], y[None]


class GlottisDatasetHDF5:
    """Drop-in indexable dataset over a reference-format HDF5 cache
    (openglottal/data.py:262-329): pre-letterboxed uint8 ``images``/``masks``
    datasets, loaded once into RAM, with the same optional train-time
    augmentation as :class:`GlottisDataset`.

    Returns torch float tensors (1, 256, 256) like the reference (numpy
    when torch is unavailable).  The reference reads items lazily through
    h5py per ``__getitem__``; here the whole cache is materialised up front
    (data/dataset.load_glottis_hdf5) — the TPU trainers want packed arrays,
    and the caches are small (uint8 256², ~65 KB/frame).
    """

    SIZE = 256

    def __init__(self, h5_path, augment: bool = False, seed: int = 0):
        from openglottal_tpu.data.dataset import load_glottis_hdf5

        self.h5_path = str(h5_path)
        self.images, self.masks = load_glottis_hdf5(h5_path)
        self.augment = augment
        import jax

        self._key = jax.random.PRNGKey(seed)

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int):
        x = self.images[idx].astype(np.float32) / 255.0
        y = (self.masks[idx] > 0).astype(np.float32)

        if self.augment:
            import jax
            import jax.numpy as jnp

            from openglottal_tpu.data.augment import augment_batch

            self._key, k = jax.random.split(self._key)
            xa, ya = augment_batch(k, jnp.asarray(x)[None], jnp.asarray(y)[None])
            x, y = np.asarray(xa[0]), np.asarray(ya[0])

        try:
            import torch

            return (torch.from_numpy(x).unsqueeze(0),
                    torch.from_numpy(y).unsqueeze(0))
        except ImportError:
            return x[None], y[None]
