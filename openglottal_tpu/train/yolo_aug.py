"""Ultralytics-default train-time augmentation for the detector, batched.

The reference trains its detector through ``YOLO(...).train(...)`` with NO
augmentation overrides (scripts/train_yolo.py:107-121), i.e. the ultralytics
v8 defaults, and the paper pins "2 epochs using the default YOLOv8
augmentation" (paper/main.tex:319).  The effective pipeline (ultralytics
``v8_transforms`` at those settings):

  1. Mosaic4, p=1.0: four images on a 2S x 2S gray(114) canvas around a
     centre ~ U(0.5S, 1.5S)^2 (each tile cropped at the canvas edge).
     With epochs=2 and close_mosaic=10 the "disable mosaic for the last 10
     epochs" switch never fires (epochs - close_mosaic < 0), so mosaic is
     on for the whole reference run.
  2. RandomPerspective with degrees=shear=perspective=0, scale=0.5
     (gain ~ U(0.5, 1.5) about the canvas origin after centring),
     translate=0.1 (output-relative U(0.4, 0.6) * S), border=-S/2 -> the
     canvas warps back to S x S, borders filled 114.  Boxes map through the
     affine, clip to [0, S], and pass ultralytics ``box_candidates``
     (w,h > 2 px, aspect < 100, area ratio > 0.10 vs the pre-affine box).
  3. HSV jitter with gains h=0.015, s=0.7, v=0.4 (per-image r ~ U(-1,1)*g+1;
     hue is multiplicative-mod like cv2's uint8 LUT).
  4. Horizontal flip, p=0.5.  (mixup=0, copy-paste=0 at defaults.)

Everything runs as ONE jitted batched transform on device (the reference
does this per image in cv2 on CPU workers).  Documented divergences: HSV
runs in float (cv2 applies uint8 LUTs -> <=1 intensity-level rounding
differences), and mosaic partners are drawn uniformly from the dataset by
the caller (same distribution as ultralytics' ``random.choices``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

GRAY = 114.0 / 255.0  # ultralytics border/canvas fill


def rgb_to_hsv(rgb):
    """(..., 3) float [0,1] -> HSV with H in [0,1) (fraction of the circle)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        d <= 0, 0.0,
        jnp.where(mx == r, ((g - b) / safe) % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0))) / 6.0
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv):
    """Inverse of :func:`rgb_to_hsv` (H in [0,1))."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _mosaic_one(key, imgs, boxes, valid, s, translate, scale, hgain, sgain,
                vgain, fliplr):
    """One mosaic sample from 4 tiles.  imgs: (4, S, S, 3) f32 [0,1];
    boxes: (4, 4) xyxy px; valid: (4,).  Returns (img (S,S,3), boxes (4,4),
    valid (4,))."""
    kc, ks, kt, kh, kf = jax.random.split(key, 5)

    # mosaic centre (ultralytics: int(uniform) over the middle of the 2S
    # canvas — integer, so tile placement and box shift agree exactly)
    xc, yc = jnp.floor(
        jax.random.uniform(kc, (2,), minval=0.5 * s, maxval=1.5 * s))

    # mega-image: the 4 tiles at fixed quadrants; a canvas pixel maps into
    # exactly one tile (or the gray border) by an integer shift per quadrant
    top_row = jnp.concatenate([imgs[0], imgs[1]], axis=1)
    bot_row = jnp.concatenate([imgs[2], imgs[3]], axis=1)
    mega = jnp.concatenate([top_row, bot_row], axis=0)  # (2S, 2S, 3)

    ii = jnp.arange(2 * s, dtype=jnp.float32)
    yy = ii[:, None] + jnp.zeros((1, 2 * s))
    xx = ii[None, :] + jnp.zeros((2 * s, 1))
    left = xx < xc
    top = yy < yc
    # tile-local source coords (TL/BL tiles end at the centre; TR/BR start)
    sx = jnp.where(left, xx - xc + s, xx - xc)
    sy = jnp.where(top, yy - yc + s, yy - yc)
    inside = (sx >= 0) & (sx < s) & (sy >= 0) & (sy < s)
    mx = (sx + jnp.where(left, 0.0, s)).astype(jnp.int32).clip(0, 2 * s - 1)
    my = (sy + jnp.where(top, 0.0, s)).astype(jnp.int32).clip(0, 2 * s - 1)
    canvas = jnp.where(inside[..., None], mega[my, mx], GRAY)

    # per-tile validity of the source pixel: a tile with no gt box still
    # contributes pixels (ultralytics mosaics label-less tiles too), so no
    # masking here — validity only affects the boxes below.

    # boxes into canvas coords (tile pad = its quadrant's top-left corner)
    padw = jnp.stack([xc - s, xc, xc - s, xc])
    padh = jnp.stack([yc - s, yc - s, yc, yc])
    b1 = boxes + jnp.stack([padw, padh, padw, padh], axis=1)
    b1 = jnp.clip(b1, 0.0, 2.0 * s)  # mosaic clips to the canvas

    # affine: dst = g*(src - S) + t  (centre shift -S, scale about origin,
    # translate; degrees/shear/perspective are 0 at defaults)
    g = jax.random.uniform(ks, (), minval=1.0 - scale, maxval=1.0 + scale)
    t = jax.random.uniform(kt, (2,), minval=(0.5 - translate) * s,
                           maxval=(0.5 + translate) * s)
    oy = jnp.arange(s, dtype=jnp.float32)
    dyy = oy[:, None] + jnp.zeros((1, s))
    dxx = oy[None, :] + jnp.zeros((s, 1))
    src_x = (dxx - t[0]) / g + s
    src_y = (dyy - t[1]) / g + s
    x0 = jnp.floor(src_x).astype(jnp.int32).clip(0, 2 * s - 1)
    y0 = jnp.floor(src_y).astype(jnp.int32).clip(0, 2 * s - 1)
    x1 = (x0 + 1).clip(0, 2 * s - 1)
    y1 = (y0 + 1).clip(0, 2 * s - 1)
    wx = jnp.clip(src_x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(src_y - y0, 0.0, 1.0)[..., None]
    inb = ((src_x >= 0) & (src_x <= 2 * s - 1)
           & (src_y >= 0) & (src_y <= 2 * s - 1))[..., None]
    img = ((1 - wy) * (1 - wx) * canvas[y0, x0]
           + (1 - wy) * wx * canvas[y0, x1]
           + wy * (1 - wx) * canvas[y1, x0]
           + wy * wx * canvas[y1, x1])
    img = jnp.where(inb, img, GRAY)

    b2 = g * (b1 - s) + jnp.concatenate([t, t])
    b2 = jnp.clip(b2, 0.0, float(s))
    # ultralytics box_candidates(wh_thr=2, ar_thr=100, area_thr=0.10)
    w1 = b1[:, 2] - b1[:, 0]
    h1 = b1[:, 3] - b1[:, 1]
    w2 = b2[:, 2] - b2[:, 0]
    h2 = b2[:, 3] - b2[:, 1]
    ar = jnp.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    # raw post/pre area ratio, NO scale compensation — exactly ultralytics
    # box_candidates (a 0.5x zoom alone gives ratio 0.25, still a candidate)
    valid = (valid & (w2 > 2) & (h2 > 2) & (ar < 100)
             & (w2 * h2 / (w1 * h1 + 1e-16) > 0.10))

    # HSV jitter (r ~ U(-1,1)*gain + 1; hue multiplicative-mod like cv2)
    r = jax.random.uniform(kh, (3,), minval=-1.0, maxval=1.0) \
        * jnp.asarray([hgain, sgain, vgain]) + 1.0
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = jnp.stack([(hsv[..., 0] * r[0]) % 1.0,
                     jnp.clip(hsv[..., 1] * r[1], 0.0, 1.0),
                     jnp.clip(hsv[..., 2] * r[2], 0.0, 1.0)], axis=-1)
    img = hsv_to_rgb(hsv)

    # horizontal flip
    do_flip = jax.random.uniform(kf, ()) < fliplr
    img = jnp.where(do_flip, img[:, ::-1], img)
    b2 = jnp.where(do_flip,
                   jnp.stack([s - b2[:, 2], b2[:, 1], s - b2[:, 0], b2[:, 3]],
                             axis=1), b2)
    return img, b2, valid


@partial(jax.jit, static_argnames=("translate", "scale", "hgain", "sgain",
                                   "vgain", "fliplr"))
def mosaic_affine_hsv(key, imgs4_u8, boxes4, valid4, translate: float = 0.1,
                      scale: float = 0.5, hgain: float = 0.015,
                      sgain: float = 0.7, vgain: float = 0.4,
                      fliplr: float = 0.5):
    """Batched ultralytics-default augmentation.

    imgs4_u8: (B, 4, S, S, 3) uint8 RGB (tile 0 is "the" sample, 1-3 its
    mosaic partners); boxes4: (B, 4, 4) xyxy px (one gt per tile, the
    single-object glottis regime); valid4: (B, 4) bool.

    Returns (imgs (B, S, S, 3) f32 [0,1], boxes (B, 4, 4), valid (B, 4)) —
    up to four gt boxes per augmented image, ready for the multi-gt TAL
    loss (train/yolo_loss.py).
    """
    b, four, s = imgs4_u8.shape[0], imgs4_u8.shape[1], imgs4_u8.shape[2]
    assert four == 4
    keys = jax.random.split(key, b)
    x = imgs4_u8.astype(jnp.float32) / 255.0
    return jax.vmap(
        lambda k, im, bx, vd: _mosaic_one(k, im, bx, vd, s, translate, scale,
                                          hgain, sgain, vgain, fliplr)
    )(keys, x, boxes4, valid4)
