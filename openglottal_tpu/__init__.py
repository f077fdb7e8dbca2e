"""OpenGlottal-TPU: TPU-native glottal area segmentation from high-speed videoendoscopy.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
OpenGlottal toolkit (see /root/reference, README.md:1-12):

  * YOLOv8n glottis detector + temporal-consistency detection gate
    (reference: openglottal/models/detector.py) — here a Flax YOLOv8n plus a
    ``lax.scan`` finite-state machine over batched per-frame detections.
  * Lightweight 4-level U-Net binary segmenter
    (reference: openglottal/models/unet.py:36-88) — here a Flax NHWC U-Net
    running on frame *chunks* so the MXU stays busy.
  * Classical motion trackers VFT / YOLO-guided VFT
    (reference: openglottal/models/tracker.py) — here ``lax.scan`` recurrences
    with on-device connected-component filtering.
  * Glottal area waveform -> kinematic features
    (reference: openglottal/features.py:38-68) — here pure jnp FFT/autocorr.

Unlike the reference's per-frame Python loop (host<->device copies every
frame), the whole video -> features path here is batched over the frame axis,
jitted, and shardable across a TPU mesh (frame-axis "sequence parallelism").
"""

__version__ = "0.1.0"

from openglottal_tpu.models.unet import UNet  # noqa: F401
from openglottal_tpu.models.gate import TemporalGate  # noqa: F401

# reference-compatible API (openglottal/__init__.py:5-20) — lazy to keep
# bare imports light
def __getattr__(name):
    compat_names = {
        "TemporalDetector", "VocalFoldTracker", "YOLOGuidedVFT",
        "extract_features_detector",
        "extract_features_yolo_guided_vft", "extract_features_unet",
    }
    if name in compat_names:
        import openglottal_tpu.compat as compat

        return getattr(compat, name)
    if name == "GlottalPipelines":
        from openglottal_tpu.pipelines import GlottalPipelines

        return GlottalPipelines
    raise AttributeError(name)


__all__ = [
    "UNet", "TemporalGate", "GlottalPipelines", "TemporalDetector",
    "VocalFoldTracker", "YOLOGuidedVFT",
    "extract_features_detector", "extract_features_yolo_guided_vft",
    "extract_features_unet", "__version__",
]
