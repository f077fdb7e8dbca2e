"""Core image / signal ops, all pure jnp (jittable, vmappable, TPU-friendly)."""

from openglottal_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    crop_resize_bilinear,
    letterbox,
    letterbox_info,
    apply_letterbox,
    unletterbox,
)
from openglottal_tpu.ops.blur import gaussian_blur  # noqa: F401
from openglottal_tpu.ops.histogram import (  # noqa: F401
    masked_histogram_u8,
    masked_percentile_u8,
    masked_percentile_u8_batch,
    otsu_threshold,
)
from openglottal_tpu.ops.metrics import dice, iou, dice_loss  # noqa: F401
from openglottal_tpu.ops.blobs import connected_components, top_n_blobs  # noqa: F401
