"""Resize / letterbox ops as separable interpolation-matrix matmuls.

Design: instead of gather-based interpolation, each 2-D resize is expressed as
``A_h @ img @ A_w.T`` where ``A_h: (out_h, in_h)`` and ``A_w: (out_w, in_w)``
are interpolation matrices.  On TPU this maps straight onto the MXU, batches
trivially over the frame axis, and — the key trick — the matrices can be built
from *traced* scalars (crop origin/size), so per-frame dynamic crops become
static-shape matmuls instead of dynamic slices.

Semantics match OpenCV (the reference uses cv2 everywhere):
  * bilinear = cv2.INTER_LINEAR: src = (dst + 0.5) * in/out - 0.5, border
    replicate, no antialiasing  (reference openglottal/utils.py:57-61,234).
  * nearest  = cv2.INTER_NEAREST: src = floor(dst * in/out).
  * letterbox geometry = reference openglottal/utils.py:66-186 (scale longest
    side to ``size``, symmetric zero padding, pad_top = pad//2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def _is_static(*vals) -> bool:
    return all(isinstance(v, (int, float, np.integer, np.floating)) for v in vals)


def _linear_matrix(in_size: int, out_size, start=0.0, length=None, dtype=jnp.float32):
    """Bilinear interpolation matrix (out_size, in_size), cv2.INTER_LINEAR semantics.

    ``start``/``length`` select a source window [start, start+length) that is
    resampled to ``out_size`` points (default: the whole input).  Interpolation
    taps clamp to the *window* (cv2 resizes the crop, so it replicates the
    crop border, not pixels outside the crop).  Static geometry is computed in
    numpy float64 to match cv2's double-precision coordinate math exactly;
    traced geometry (per-frame crops) uses f32 on device.
    """
    if length is None:
        length = float(in_size)
    if _is_static(start, length):
        i = np.arange(out_size, dtype=np.float64)
        f = float(start) + (i + 0.5) * (float(length) / out_size) - 0.5
        lo = np.floor(f)
        w = f - lo
        win_lo, win_hi = float(start), float(start) + float(length) - 1.0
        lo0 = np.clip(np.clip(lo, win_lo, win_hi), 0, in_size - 1)
        lo1 = np.clip(np.clip(lo + 1, win_lo, win_hi), 0, in_size - 1)
        j = np.arange(in_size, dtype=np.float64)
        a = (j[None, :] == lo0[:, None]) * (1.0 - w)[:, None]
        a = a + (j[None, :] == lo1[:, None]) * w[:, None]
        return jnp.asarray(a, dtype)
    i = jnp.arange(out_size, dtype=jnp.float32)
    start = jnp.asarray(start, jnp.float32)
    length = jnp.asarray(length, jnp.float32)
    f = start + (i + 0.5) * (length / out_size) - 0.5
    lo = jnp.floor(f)
    w = (f - lo).astype(dtype)
    win_lo, win_hi = start, start + length - 1.0
    j = jnp.arange(in_size, dtype=jnp.float32)
    lo0 = jnp.clip(jnp.clip(lo, win_lo, win_hi), 0, in_size - 1)[:, None]
    lo1 = jnp.clip(jnp.clip(lo + 1, win_lo, win_hi), 0, in_size - 1)[:, None]
    a = (j[None, :] == lo0).astype(dtype) * (1.0 - w)[:, None]
    a = a + (j[None, :] == lo1).astype(dtype) * w[:, None]
    return a


def _nearest_matrix(in_size: int, out_size, start=0.0, length=None, dtype=jnp.float32):
    """Nearest-neighbour matrix, cv2.INTER_NEAREST semantics (src = floor(dst*scale))."""
    if length is None:
        length = float(in_size)
    # cv2 resizeNN computes the scale as ifx = 1./(dst/src) in double (double
    # rounding!): src = floor(i * (1/(out/in))).  Empirically pinned: 120->154
    # maps i=77 to 59, not the exact-rational 60, because
    # 1/(154/120) < 120/154 in f64; every other probed ratio matches exact
    # floor division (tests/test_resize.py).
    if _is_static(start, length):
        i = np.arange(out_size, dtype=np.float64)
        scale = 1.0 / (out_size / float(length))
        f = float(start) + i * scale
        win_hi = float(start) + float(length) - 1.0
        src = np.clip(np.clip(np.floor(f), float(start), win_hi), 0, in_size - 1)
        j = np.arange(in_size, dtype=np.float64)
        return jnp.asarray(j[None, :] == src[:, None], dtype)
    i = jnp.arange(out_size, dtype=jnp.float32)
    start = jnp.asarray(start, jnp.float32)
    length = jnp.asarray(length, jnp.float32)
    f = start + i * (length / out_size)
    src = jnp.clip(jnp.clip(jnp.floor(f), start, start + length - 1.0), 0, in_size - 1)[:, None]
    j = jnp.arange(in_size, dtype=jnp.float32)
    return (j[None, :] == src).astype(dtype)


def _apply_sep(img, a_h, a_w):
    """out = a_h @ img @ a_w.T over the trailing two axes of ``img``."""
    img = img.astype(a_h.dtype)
    out = jnp.einsum("oh,...hw->...ow", a_h, img, precision=_HI)
    return jnp.einsum("pw,...ow->...op", a_w, out, precision=_HI)


@partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear(img, out_h: int, out_w: int):
    """cv2.INTER_LINEAR resize of ``img`` (..., H, W) -> (..., out_h, out_w), float32."""
    h, w = img.shape[-2], img.shape[-1]
    return _apply_sep(img, _linear_matrix(h, out_h), _linear_matrix(w, out_w))


@partial(jax.jit, static_argnums=(1, 2))
def resize_nearest(img, out_h: int, out_w: int):
    """cv2.INTER_NEAREST resize of ``img`` (..., H, W) -> (..., out_h, out_w), float32."""
    h, w = img.shape[-2], img.shape[-1]
    return _apply_sep(img, _nearest_matrix(h, out_h), _nearest_matrix(w, out_w))


def crop_resize_bilinear(img, y1, x1, ch, cw, out_h: int, out_w: int):
    """Bilinear-resample the (traced) window [y1:y1+ch, x1:x1+cw] to (out_h, out_w).

    Equivalent to ``cv2.resize(img[y1:y1+ch, x1:x1+cw], (out_w, out_h),
    INTER_LINEAR)`` for integer window coordinates, but jittable/vmappable with
    per-frame traced windows.  Replaces the reference's per-frame Python crop
    (openglottal/features.py:117, scripts/eval_girafe.py:127-159).
    """
    h, w = img.shape[-2], img.shape[-1]
    a_h = _linear_matrix(h, out_h, start=y1, length=ch)
    a_w = _linear_matrix(w, out_w, start=x1, length=cw)
    return _apply_sep(img, a_h, a_w)


def letterbox_info(h: int, w: int, size: int = 256):
    """Static letterbox geometry — reference openglottal/utils.py:97-133.

    Returns (pad_top, pad_left, content_h, content_w) as Python ints.
    """
    scale = size / max(h, w)
    content_h = int(round(h * scale))
    content_w = int(round(w * scale))
    pad_top = (size - content_h) // 2
    pad_left = (size - content_w) // 2
    return pad_top, pad_left, content_h, content_w


def _window_matrix(in_size: int, size: int, pad: int, content: int, method: str):
    """Matrix mapping input axis -> letterboxed axis: rows outside content are 0 (pad value)."""
    make = _linear_matrix if method == "linear" else _nearest_matrix
    core = make(in_size, content)  # (content, in_size)
    return jnp.zeros((size, in_size), core.dtype).at[pad : pad + content].set(core)


@partial(jax.jit, static_argnums=(1, 2))
def letterbox(img, size: int = 256, method: str = "linear"):
    """Aspect-preserving resize + symmetric zero-pad to (size, size).

    Matches reference openglottal/utils.py:66-94 with value=0.  ``method``
    mirrors the reference's interp choice (it uses INTER_LINEAR for 3-channel
    and INTER_NEAREST for 2-D arrays; callers pick explicitly here).
    Operates on (..., H, W).
    """
    h, w = img.shape[-2], img.shape[-1]
    pt, pl, ch, cw = letterbox_info(h, w, size)
    a_h = _window_matrix(h, size, pt, ch, method)
    a_w = _window_matrix(w, size, pl, cw, method)
    return _apply_sep(img, a_h, a_w)


@partial(jax.jit, static_argnums=(1, 2))
def apply_letterbox(img, size: int, method: str = "nearest"):
    """Letterbox a mask/image with the geometry implied by its own shape.

    Reference ``letterbox_apply_geometry`` (utils.py:136-163) re-applies the
    geometry of a paired image; since geometry is a pure function of (h, w,
    size) this is identical to :func:`letterbox` with the right method.
    """
    return letterbox(img, size, method)


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def unletterbox(
    boxed,
    pad_top: int,
    pad_left: int,
    content_h: int,
    content_w: int,
    target_h: int,
    target_w: int,
    method: str = "nearest",
):
    """Crop the content region of a letterboxed array and resize to target size.

    Matches reference openglottal/utils.py:166-186 (default INTER_NEAREST).
    Operates on (..., size, size).
    """
    crop = boxed[..., pad_top : pad_top + content_h, pad_left : pad_left + content_w]
    if (content_h, content_w) == (target_h, target_w):
        return crop
    if method == "linear":
        return resize_bilinear(crop, target_h, target_w)
    return resize_nearest(crop, target_h, target_w)


# ── Dynamic (traced) crop-letterbox geometry ─────────────────────────────────
#
# The crop pipeline letterboxes a per-frame detection crop to 256² and
# projects the predicted mask back (reference scripts/eval_girafe.py:127-159,
# scripts/infer.py:222-248).  Crop sizes are data-dependent, so the geometry
# must be traced; all coordinate math below is integer-exact (no float floor
# drift) and the resamplings stay static-shape matmuls.


def _round_half_even_div(n, d):
    """round(n / d) with banker's rounding (matches Python round / reference
    ``int(round(h * scale))``, utils.py:79) — integer inputs."""
    q = n // d
    r = n - q * d
    up = (2 * r > d) | ((2 * r == d) & (q % 2 == 1))
    return q + up.astype(q.dtype)


def dyn_letterbox_geometry(ch, cw, size: int = 256):
    """Traced letterbox geometry for a (ch, cw) crop -> (size, size).

    Returns (pad_t, pad_l, content_h, content_w) int32, clamped to >= 1.
    """
    ch = jnp.maximum(ch.astype(jnp.int32), 1)
    cw = jnp.maximum(cw.astype(jnp.int32), 1)
    md = jnp.maximum(ch, cw)
    content_h = jnp.maximum(_round_half_even_div(size * ch, md), 1)
    content_w = jnp.maximum(_round_half_even_div(size * cw, md), 1)
    return (size - content_h) // 2, (size - content_w) // 2, content_h, content_w


def dyn_letterbox_matrix_nearest(in_size: int, size: int, start, clen, pad, content):
    """(size, in_size) nearest matrix: letterbox the window [start, start+clen)
    of an axis into rows [pad, pad+content) of a ``size`` axis; other rows 0.
    cv2 resizeNN float32 semantics: src = floor(i * f32(in/out))."""
    i = jnp.arange(size, dtype=jnp.int32)
    inside = (i >= pad) & (i < pad + content)
    scale = clen.astype(jnp.float32) / jnp.maximum(content, 1).astype(jnp.float32)
    local = jnp.floor((i - pad).astype(jnp.float32) * scale).astype(jnp.int32)
    src = start + jnp.clip(local, 0, jnp.maximum(clen - 1, 0))
    src = jnp.clip(src, 0, in_size - 1)
    j = jnp.arange(in_size, dtype=jnp.int32)
    return ((j[None, :] == src[:, None]) & inside[:, None]).astype(jnp.float32)


def dyn_unletterbox_matrix_nearest(in_size: int, size: int, start, clen, pad, content):
    """(in_size, size) nearest matrix: project rows [pad, pad+content) of a
    letterboxed ``size`` axis back onto the window [start, start+clen) of the
    original axis (unletterbox + paste fused); other rows 0."""
    r = jnp.arange(in_size, dtype=jnp.int32)
    valid = (r >= start) & (r < start + clen)
    scale = content.astype(jnp.float32) / jnp.maximum(clen, 1).astype(jnp.float32)
    local = jnp.floor((r - start).astype(jnp.float32) * scale).astype(jnp.int32)
    j = pad + jnp.clip(local, 0, jnp.maximum(content - 1, 0))
    j = jnp.clip(j, 0, size - 1)
    k = jnp.arange(size, dtype=jnp.int32)
    return ((k[None, :] == j[:, None]) & valid[:, None]).astype(jnp.float32)


def letterbox_np(img: np.ndarray, size: int = 256, value: int = 0):
    """Host-side numpy letterbox for data preprocessing (same geometry).

    Uses cv2 directly — this is the offline dataset-materialisation path
    (reference openglottal/data.py:200-259), not the device hot path.
    """
    import cv2

    h, w = img.shape[:2]
    pt, pl, ch, cw = letterbox_info(h, w, size)
    interp = cv2.INTER_LINEAR if img.ndim == 3 else cv2.INTER_NEAREST
    resized = cv2.resize(img, (cw, ch), interpolation=interp)
    out_shape = (size, size) + img.shape[2:]
    out = np.full(out_shape, value, dtype=img.dtype)
    out[pt : pt + ch, pl : pl + cw] = resized
    return out
