"""Lightweight 4-level U-Net for binary glottal segmentation (Flax, NHWC).

Same architecture family as the reference (openglottal/models/unet.py:18-88):
encoder widths (32, 64, 128, 256), DoubleConv = 2 x (Conv3x3 -> BN -> ReLU),
2x2 max-pool, ConvTranspose(k=2, s=2) upsampling with skip concatenation
(skip first, matching torch.cat([s, x], dim=1) at unet.py:86), 1x1 logits
head.  7.76M parameters (paper/main.tex:368-369).

TPU-first differences: NHWC layout, fp32 params with configurable compute
dtype (bfloat16 on TPU), and the forward pass is designed to run on *chunks*
of video frames (N = frame-chunk axis) rather than per frame.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class DoubleConv(nn.Module):
    """Two Conv3x3(no bias) -> BatchNorm -> ReLU blocks (reference unet.py:18-33).

    ``fuse_bn=True`` runs the inference-folded form Conv3x3(+bias) -> ReLU
    (BatchNorm scale/shift pre-multiplied into the conv weights by
    models/fold.fold_batchnorm) — same math up to float reassociation, one
    fewer HBM round-trip per conv on TPU.  Conv param names are unchanged,
    so folded variables drop straight in."""

    out_ch: int
    dtype: Any = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(
                self.out_ch, (3, 3), padding=1, use_bias=self.fuse_bn,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
            if not self.fuse_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=jnp.float32,
                )(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """U-Net over NHWC frames; returns raw logits (reference unet.py:36-88)."""

    out_ch: int = 1
    features: Sequence[int] = (32, 64, 128, 256)
    dtype: Any = jnp.float32
    fuse_bn: bool = False  # inference-folded BN (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        skips = []
        for f in self.features:
            x = DoubleConv(f, self.dtype, self.fuse_bn)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = DoubleConv(self.features[-1] * 2, self.dtype, self.fuse_bn)(x, train)

        for f in reversed(self.features):
            x = nn.ConvTranspose(
                f, (2, 2), strides=(2, 2),
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
            s = skips.pop()
            if x.shape[1:3] != s.shape[1:3]:  # bilinear size fix (unet.py:84-85)
                x = jax.image.resize(
                    x, (x.shape[0], s.shape[1], s.shape[2], x.shape[3]), "bilinear"
                )
            x = jnp.concatenate([s, x.astype(s.dtype)], axis=-1)
            x = DoubleConv(f, self.dtype, self.fuse_bn)(x, train)

        return nn.Conv(self.out_ch, (1, 1), param_dtype=jnp.float32,
                       dtype=self.dtype)(x).astype(jnp.float32)


def init_unet(rng, features=(32, 64, 128, 256), dtype=jnp.float32, size: int = 256):
    """Initialise a U-Net; returns (model, variables)."""
    model = UNet(features=tuple(features), dtype=dtype)
    variables = model.init(rng, jnp.zeros((1, size, size, 1), jnp.float32), train=False)
    return model, variables


def segment_frames(variables, frames_gray_u8, model: UNet | None = None,
                   threshold: float = 0.5, chunk_dtype=jnp.float32):
    """Batched equivalent of the reference's per-frame ``unet_segment_frame``
    (openglottal/utils.py:218-241).

    frames_gray_u8: (N, H, W) uint8 grayscale.  Each frame is bilinearly
    resized to 256x256 (cv2 semantics), normalised to [0,1], segmented, and
    the probability map resized back; returns boolean masks (N, H, W).
    """
    from openglottal_tpu.ops.resize import resize_bilinear

    if model is None:
        model = UNet(dtype=chunk_dtype)
    n, h, w = frames_gray_u8.shape
    x = frames_gray_u8.astype(jnp.float32)
    if (h, w) != (256, 256):
        x = resize_bilinear(x, 256, 256)
    x = (x / 255.0)[..., None]
    logits = model.apply(variables, x, train=False)
    prob = jax.nn.sigmoid(logits[..., 0])
    if (h, w) != (256, 256):
        prob = resize_bilinear(prob, h, w)
    return prob > threshold
