from openglottal_tpu.models.unet import UNet, DoubleConv  # noqa: F401
from openglottal_tpu.models.gate import TemporalGate, gate_scan  # noqa: F401


def __getattr__(name):
    # reference models/__init__.py also exports the stateful compat classes
    # (TemporalDetector, VocalFoldTracker, YOLOGuidedVFT, GlottisDataset);
    # lazy to keep bare model imports light
    if name in ("TemporalDetector", "VocalFoldTracker", "YOLOGuidedVFT",
                "GlottisDataset"):
        import openglottal_tpu.compat as compat

        return getattr(compat, name)
    raise AttributeError(name)
