"""YOLOv8n in Flax (NHWC): CSP backbone, C2f blocks, SPPF, anchor-free
decoupled head with DFL box regression.

The reference delegates detection entirely to ultralytics
(openglottal/models/detector.py:31,58; scripts/train_yolo.py:107-121); for a
TPU-native framework we own the architecture, the max-conf postprocessing and
(in train/yolo_trainer.py) the losses.  Scale = "n": width 0.25, depth 0.33,
max 1024 channels -> per-stage channels (16, 32, 64, 128, 256), ~3.2M params
for nc=1 (paper/main.tex:942-944).

Postprocessing: the reference's TemporalDetector keeps only the argmax-conf
box of a single class (detector.py:63), so full NMS is unnecessary — decode
all anchors, take the global max-sigmoid-conf box.  That's one argmax over
~1.3k anchors, fully jittable and batched over frames.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

REG_MAX = 16
STRIDES = (8, 16, 32)


class ConvBNSiLU(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    fuse_bn: bool = False  # inference-folded Conv(+bias)->SiLU (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_ch, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2, use_bias=self.fuse_bn,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        if not self.fuse_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                             epsilon=1e-3, dtype=jnp.float32)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True
    dtype: Any = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNSiLU(self.out_ch, 3, dtype=self.dtype,
                       fuse_bn=self.fuse_bn)(x, train)
        y = ConvBNSiLU(self.out_ch, 3, dtype=self.dtype,
                       fuse_bn=self.fuse_bn)(y, train)
        if self.shortcut and x.shape[-1] == self.out_ch:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial bottleneck with 2 convolutions (v8 C2f)."""

    out_ch: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.out_ch // 2
        y = ConvBNSiLU(self.out_ch, 1, dtype=self.dtype,
                       fuse_bn=self.fuse_bn)(x, train)
        parts = [y[..., :c], y[..., c:]]
        for _ in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, dtype=self.dtype,
                                    fuse_bn=self.fuse_bn)(parts[-1], train))
        return ConvBNSiLU(self.out_ch, 1, dtype=self.dtype,
                          fuse_bn=self.fuse_bn)(
            jnp.concatenate(parts, axis=-1), train
        )


class SPPF(nn.Module):
    out_ch: int
    pool_k: int = 5
    dtype: Any = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.out_ch // 2
        x = ConvBNSiLU(c, 1, dtype=self.dtype, fuse_bn=self.fuse_bn)(x, train)
        p = self.pool_k // 2
        pools = [x]
        for _ in range(3):
            pools.append(nn.max_pool(pools[-1], (self.pool_k, self.pool_k),
                                     strides=(1, 1), padding=((p, p), (p, p))))
        return ConvBNSiLU(self.out_ch, 1, dtype=self.dtype,
                          fuse_bn=self.fuse_bn)(
            jnp.concatenate(pools, axis=-1), train
        )


def _upsample2x(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class DetectHead(nn.Module):
    """Decoupled anchor-free head: per-level box (4*REG_MAX) + cls (nc) logits."""

    nc: int = 1
    ch: Sequence[int] = (64, 128, 256)
    dtype: Any = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            b = ConvBNSiLU(c2, 3, dtype=self.dtype, fuse_bn=self.fuse_bn,
                           name=f"box{i}_0")(x, train)
            b = ConvBNSiLU(c2, 3, dtype=self.dtype, fuse_bn=self.fuse_bn,
                           name=f"box{i}_1")(b, train)
            b = nn.Conv(4 * REG_MAX, (1, 1), param_dtype=jnp.float32,
                        dtype=self.dtype, name=f"box{i}_2")(b)
            c = ConvBNSiLU(c3, 3, dtype=self.dtype, fuse_bn=self.fuse_bn,
                           name=f"cls{i}_0")(x, train)
            c = ConvBNSiLU(c3, 3, dtype=self.dtype, fuse_bn=self.fuse_bn,
                           name=f"cls{i}_1")(c, train)
            c = nn.Conv(self.nc, (1, 1), param_dtype=jnp.float32,
                        dtype=self.dtype, name=f"cls{i}_2")(c)
            outs.append((b.astype(jnp.float32), c.astype(jnp.float32)))
        return outs


class YOLOv8(nn.Module):
    """YOLOv8 detection model; returns per-level (box_logits, cls_logits)."""

    nc: int = 1
    width: Sequence[int] = (16, 32, 64, 128, 256)  # n-scale per-stage channels
    depth: Sequence[int] = (1, 2, 2, 1)            # n-scale C2f repeats
    dtype: Any = jnp.float32
    fuse_bn: bool = False  # inference-folded BN (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        d = self.depth
        dt = self.dtype
        fb = self.fuse_bn
        x = x.astype(dt)
        x = ConvBNSiLU(w[0], 3, 2, dt, fb)(x, train)                   # P1/2
        x = ConvBNSiLU(w[1], 3, 2, dt, fb)(x, train)                   # P2/4
        x = C2f(w[1], d[0], True, dt, fb)(x, train)
        x = ConvBNSiLU(w[2], 3, 2, dt, fb)(x, train)                   # P3/8
        x4 = C2f(w[2], d[1], True, dt, fb)(x, train)
        x = ConvBNSiLU(w[3], 3, 2, dt, fb)(x4, train)                  # P4/16
        x6 = C2f(w[3], d[2], True, dt, fb)(x, train)
        x = ConvBNSiLU(w[4], 3, 2, dt, fb)(x6, train)                  # P5/32
        x = C2f(w[4], d[3], True, dt, fb)(x, train)
        x9 = SPPF(w[4], 5, dt, fb)(x, train)

        x = jnp.concatenate([_upsample2x(x9), x6], axis=-1)
        x12 = C2f(w[3], d[3], False, dt, fb)(x, train)
        x = jnp.concatenate([_upsample2x(x12), x4], axis=-1)
        p3 = C2f(w[2], d[3], False, dt, fb)(x, train)
        x = ConvBNSiLU(w[2], 3, 2, dt, fb)(p3, train)
        x = jnp.concatenate([x, x12], axis=-1)
        p4 = C2f(w[3], d[3], False, dt, fb)(x, train)
        x = ConvBNSiLU(w[3], 3, 2, dt, fb)(p4, train)
        x = jnp.concatenate([x, x9], axis=-1)
        p5 = C2f(w[4], d[3], False, dt, fb)(x, train)

        return DetectHead(self.nc, (w[2], w[3], w[4]), dt, fb)(
            [p3, p4, p5], train
        )


def init_yolo(rng, nc: int = 1, size: int = 256, dtype=jnp.float32):
    model = YOLOv8(nc=nc, dtype=dtype)
    variables = model.init(rng, jnp.zeros((1, size, size, 3), jnp.float32), train=False)
    return model, variables


def anchors_for(size_h: int, size_w: int):
    """Anchor centres (in pixels) and strides for all levels, concatenated."""
    pts, strides = [], []
    for s in STRIDES:
        h, w = size_h // s, size_w // s
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * s
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * s
        gy, gx = jnp.meshgrid(cy, cx, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        strides.append(jnp.full((h * w,), s, jnp.float32))
    return jnp.concatenate(pts, 0), jnp.concatenate(strides, 0)


def decode_boxes(level_outputs, size_h: int, size_w: int):
    """DFL-decode all anchors -> (boxes_xyxy (N, A, 4), conf (N, A, nc))."""
    boxes, confs = [], []
    for (b, c), s in zip(level_outputs, STRIDES):
        n, h, w, _ = b.shape
        dist = b.reshape(n, h * w, 4, REG_MAX)
        dist = jax.nn.softmax(dist, axis=-1) @ jnp.arange(REG_MAX, dtype=jnp.float32)
        boxes.append(dist)  # (N, hw, 4) ltrb in stride units
        confs.append(jax.nn.sigmoid(c.reshape(n, h * w, -1)))
    pts, strides = anchors_for(size_h, size_w)
    dist = jnp.concatenate(boxes, 1)
    conf = jnp.concatenate(confs, 1)
    x1y1 = pts[None] - dist[..., :2] * strides[None, :, None]
    x2y2 = pts[None] + dist[..., 2:] * strides[None, :, None]
    return jnp.concatenate([x1y1, x2y2], -1), conf


def max_conf_detect(level_outputs, size_h: int, size_w: int, conf_thresh: float = 0.25):
    """Reference postproc (detector.py:58-69): keep only the argmax-conf box.

    Returns (has (N,) bool, best_box (N, 4) f32 xyxy, best_conf (N,)).
    """
    boxes, conf = decode_boxes(level_outputs, size_h, size_w)
    conf = conf.max(-1)  # single class in practice; max over classes otherwise
    idx = jnp.argmax(conf, axis=1)
    best_conf = jnp.take_along_axis(conf, idx[:, None], 1)[:, 0]
    best_box = jnp.take_along_axis(boxes, idx[:, None, None], 1)[:, 0]
    return best_conf > conf_thresh, best_box, best_conf


class YoloDetector:
    """Batched detector wrapper: BGR uint8 frames -> per-frame max-conf boxes.

    Mirrors the configuration surface of the reference TemporalDetector
    (conf threshold, detector.py:23-30); the temporal gate itself lives in
    models/gate.py and consumes this wrapper's output.
    """

    def __init__(self, variables, conf: float = 0.25, nc: int = 1,
                 dtype=jnp.float32):
        self.model = YOLOv8(nc=nc, dtype=dtype)
        self.variables = variables
        self.conf = conf

    @partial(jax.jit, static_argnums=(0,))
    def _run(self, frames_rgb01):
        outs = self.model.apply(self.variables, frames_rgb01, train=False)
        h, w = frames_rgb01.shape[1:3]
        return max_conf_detect(outs, h, w, self.conf)

    def detect_frames(self, frames_bgr_u8):
        """frames_bgr_u8: (N, H, W, 3) uint8 BGR, H=W=256 expected (GIRAFE
        native size; other sizes must be letterboxed upstream, as every
        reference eval path does)."""
        x = frames_bgr_u8[..., ::-1].astype(jnp.float32) / 255.0
        return self._run(x)
