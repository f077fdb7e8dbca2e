from openglottal_tpu.models.unet import UNet, DoubleConv  # noqa: F401
from openglottal_tpu.models.gate import TemporalGate, gate_scan  # noqa: F401
