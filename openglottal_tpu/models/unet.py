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


class _SplitConv3x3(nn.Module):
    """Conv3x3 over the concatenation of two inputs WITHOUT materialising it:

        conv(concat([s, x]), k) == conv(s, k[:, :, :cs]) + conv(x, k[:, :, cs:])

    (convolution is linear in the input channels).  The parameter tree —
    ``kernel`` (3, 3, cs+cx, out) and optional ``bias`` — is identical in
    name, shape, and init to ``nn.Conv`` applied to the concat, so variables
    are interchangeable; only the lowering changes.  Isolated, the split wins
    on TPU v5e (7.9 -> 5.6 ms per 128-frame chunk on the 256² 64->32 decoder
    conv, scripts/perf_probe.py stages); at full-model level XLA already schedules
    the concat well and the split measured ~5 ms/video slower
    (scripts/perf_probe.py followup), so it is NOT the default.
    Numerics differ from the
    concat form only at the single reassociation boundary between the two
    partial sums (~1 ulp; pinned by tests/test_unet.py)."""

    out_ch: int
    dtype: Any = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, s, x):
        cs, cx = s.shape[-1], x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cs + cx, self.out_ch), jnp.float32)
        k = kernel.astype(self.dtype)
        s = s.astype(self.dtype)
        x = x.astype(self.dtype)

        def conv(inp, kk):
            dn = jax.lax.conv_dimension_numbers(
                inp.shape, kk.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                inp, kk, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)

        y = conv(s, k[:, :, :cs]) + conv(x, k[:, :, cs:])
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.out_ch,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class DoubleConv(nn.Module):
    """Two Conv3x3(no bias) -> BatchNorm -> ReLU blocks (reference unet.py:18-33).

    ``fuse_bn=True`` runs the inference-folded form Conv3x3(+bias) -> ReLU
    (BatchNorm scale/shift pre-multiplied into the conv weights by
    models/fold.fold_batchnorm) — same math up to float reassociation, one
    fewer HBM round-trip per conv on TPU.  Conv param names are unchanged,
    so folded variables drop straight in.

    ``skip``: decoder blocks may pass the skip connection separately instead
    of concatenating — the first conv then runs as :class:`_SplitConv3x3`
    (same parameters, no concat materialisation)."""

    out_ch: int
    dtype: Any = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, skip=None):
        for i in range(2):
            if i == 0 and skip is not None:
                x = _SplitConv3x3(self.out_ch, self.dtype, self.fuse_bn,
                                  name="Conv_0")(skip, x)
            else:
                x = nn.Conv(
                    self.out_ch, (3, 3), padding=1, use_bias=self.fuse_bn,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"Conv_{i}",
                )(x)
            if not self.fuse_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=jnp.float32, name=f"BatchNorm_{i}",
                )(x)
            x = nn.relu(x)
        return x


class DepthToSpaceUp(nn.Module):
    """``nn.ConvTranspose((2, 2), strides=(2, 2))`` lowered as one dense
    matmul + depth-to-space.

    A 2x2-stride-2 transposed conv has non-overlapping taps, so each output
    pixel is a single dot product over the input channels:

        out[2i+di, 2j+dj, o] = x[i, j, :] @ kernel[1-di, 1-dj, :, o] + bias[o]

    (kernel orientation verified numerically against flax's lowering).  The
    parameters — ``kernel`` (2, 2, cin, cout) and ``bias`` (cout,) — are
    bit-identical in name, shape, and init to ``nn.ConvTranspose``, so
    trained/folded variables drop in either way; only the lowering changes
    (one (cin, 4*cout) matmul + depth-to-space).  Measured SLOWER than XLA's
    ConvTranspose lowering at full-model level on TPU v5e (perf_probe.py stages —
    the d2s transpose costs an extra full-tensor HBM round-trip), so it is
    NOT the default; kept because the interchangeable-parameters property is
    useful and pinned (tests/test_unet.py).
    """

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, cin, self.out_ch), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.out_ch,), jnp.float32)
        k = kernel[::-1, ::-1].reshape(4, cin, self.out_ch)
        k = k.transpose(1, 0, 2).reshape(cin, 4 * self.out_ch)
        x = x.astype(self.dtype)
        y = x @ k.astype(self.dtype) + jnp.tile(bias, 4).astype(self.dtype)
        n, h, w, _ = y.shape
        y = y.reshape(n, h, w, 2, 2, self.out_ch)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, 2 * h, 2 * w, self.out_ch)


class UNet(nn.Module):
    """U-Net over NHWC frames; returns raw logits (reference unet.py:36-88)."""

    out_ch: int = 1
    features: Sequence[int] = (32, 64, 128, 256)
    dtype: Any = jnp.float32
    fuse_bn: bool = False  # inference-folded BN (models/fold.py)
    # matmul+depth-to-space upsampling (same params/math as nn.ConvTranspose,
    # see DepthToSpaceUp).  Default OFF: measured SLOWER on TPU v5e — the
    # whole-video U-Net pass is 130 ms with XLA's ConvTranspose lowering vs
    # 153 ms with d2s (scripts/perf_probe.py stages) because the depth-to-space
    # transpose materialises an extra full-tensor HBM round-trip that the
    # fused transposed-conv epilogue avoids.  Kept as an option because the
    # parameter trees are interchangeable (tests/test_unet.py).
    d2s_up: bool = False
    # decoder skip connections consumed WITHOUT materialising the concat
    # (_SplitConv3x3 — same parameters).  Default OFF: the isolated-layer
    # microbench wins (7.9 -> 5.6 ms, perf_probe.py stages) but at FULL-model level
    # XLA already schedules the concat well and the split form measured
    # ~5 ms/512-frame-video slower (130.0 -> 136.0 ms,
    # scripts/perf_probe.py followup).
    # Kept as an interchangeable-parameters option (tests/test_unet.py).
    split_skip: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        skips = []
        for f in self.features:
            x = DoubleConv(f, self.dtype, self.fuse_bn)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = DoubleConv(self.features[-1] * 2, self.dtype, self.fuse_bn)(x, train)

        for i, f in enumerate(reversed(self.features)):
            if self.d2s_up:
                x = DepthToSpaceUp(f, self.dtype,
                                   name=f"ConvTranspose_{i}")(x)
            else:
                x = nn.ConvTranspose(
                    f, (2, 2), strides=(2, 2),
                    dtype=self.dtype, param_dtype=jnp.float32,
                )(x)
            s = skips.pop()
            if x.shape[1:3] != s.shape[1:3]:  # bilinear size fix (unet.py:84-85)
                x = jax.image.resize(
                    x, (x.shape[0], s.shape[1], s.shape[2], x.shape[3]), "bilinear"
                )
            if self.split_skip:
                # skip-first channel order preserved (torch.cat([s, x], dim=1))
                x = DoubleConv(f, self.dtype, self.fuse_bn)(
                    x.astype(s.dtype), train, skip=s)
            else:
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
