"""Classical motion trackers as ``lax.scan`` recurrences over the frame axis.

Reference: openglottal/models/tracker.py —
  * VocalFoldTracker (VFT, :11-114): EMA motion map of Gaussian-blurred
    absdiffs; ROI = largest blob above roi_threshold_ratio * peak; intensity
    threshold = beta-EMA of the glottal_percentile of ROI pixels; output =
    (dark AND in-ROI) pixels filtered to the max_glottal_components largest
    blobs.
  * YOLOGuidedVFT (:117-232): same EMA machinery but the ROI is the YOLO
    bbox rectangle; empty mask when no bbox.

TPU design: frames arrive as a (T, H, W) float array of integer pixel values
(uint8 range), the carry is (prev_frame, motion_map, threshold), and every
per-frame step is static-shape jnp: masked uint8 percentiles run on
histograms (ops/histogram.py), blob filtering on the label-propagation CC
kernel (ops/blobs.py).  Everything jits into one scan per video.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from openglottal_tpu.ops.blur import gaussian_blur
from openglottal_tpu.ops.blobs import (
    largest_blob,
    largest_blob_batch,
    roi_window_origin,
    top_n_blobs,
    top_n_blobs_batch,
)
from openglottal_tpu.ops.histogram import (
    masked_histogram_u8,
    masked_percentile_u8_batch,
    percentile_from_hist,
)


class VFTParams(NamedTuple):
    """Defaults = reference VFT_PARAMS (openglottal/features.py:14-21)."""

    alpha: float = 0.98
    beta: float = 0.7
    roi_threshold_ratio: float = 0.07
    gaussian_ksize: int = 13
    glottal_percentile: float = 5.0
    max_glottal_components: int = 2


class YGVFTParams(NamedTuple):
    """Defaults = reference YGVFT_PARAMS (openglottal/features.py:23-29)."""

    alpha: float = 0.98
    beta: float = 0.7
    glottal_percentile: float = 30.0
    gaussian_ksize: int = 13
    max_glottal_components: int = 2


def _roi_percentile(frame, roi, pct, fallback, min_px):
    """percentile(frame[roi], pct) if count > min_px else fallback
    (tracker.py:109: ``if px.size > 10``; :93 uses > 0 at init)."""
    hist = masked_histogram_u8(frame, roi)
    val, n = percentile_from_hist(hist, pct)
    return jnp.where(n > min_px, val, fallback)


def vft_initialize(init_frames, p: VFTParams):
    """Seed carry from N init frames (tracker.py:81-94).

    init_frames: (N, H, W) float32 integer-valued grayscale, already resized
    to the locked crop size (the caller locks sizes, features.py:124-127).
    Returns carry (prev, lmap, thresh).
    """
    ff = init_frames.astype(jnp.float32)
    n = ff.shape[0]
    avg = jnp.abs(ff[1:] - ff[:-1]).sum(0) / (n - 1)
    lmap = gaussian_blur(avg, p.gaussian_ksize)
    peak = lmap.max()
    rthr = jnp.where(peak > 0, peak * p.roi_threshold_ratio, 1.0)
    rm = largest_blob(lmap > rthr)
    thresh = _roi_percentile(ff[0], rm, p.glottal_percentile, 127.0, min_px=0)
    return ff[-1], lmap, thresh


def vft_step(carry, frame, p: VFTParams):
    """One VFT frame (tracker.py:96-114). frame: (H, W) f32 integer-valued."""
    prev, lmap, thresh = carry
    ff = frame.astype(jnp.float32)
    d = gaussian_blur(jnp.abs(ff - prev), p.gaussian_ksize)
    lmap = p.alpha * d + (1.0 - p.alpha) * lmap
    peak = lmap.max()
    rthr = jnp.where(peak > 0, peak * p.roi_threshold_ratio, 1.0)
    roi = largest_blob(lmap > rthr)
    cur = _roi_percentile(ff, roi, p.glottal_percentile, thresh, min_px=10)
    thresh = p.beta * thresh + (1.0 - p.beta) * cur
    raw = (ff < thresh) & roi
    mask = top_n_blobs(raw, p.max_glottal_components)
    return (ff, lmap, thresh), mask


@partial(jax.jit, static_argnames=("params",))
def vft_scan_carry(carry, frames, active=None,
                   params: VFTParams = VFTParams()):
    """Segment-resumable VFT scan: run a segment from an explicit carry
    (prev, lmap, thresh) and return the updated carry — the tracker analog
    of models/gate.gate_scan_carry, for streaming (bounded-memory) use.
    Chained segment calls are bit-identical to one :func:`vft_scan` over the
    concatenation (the carry IS the full tracker state).

    ``active`` (T,) bool marks real frames; inactive steps pass the carry
    through untouched and emit an empty mask.
    Returns (carry, (masks (T, H, W) bool, areas (T,) f32)).
    """
    if active is None:
        active = jnp.ones((frames.shape[0],), jnp.bool_)

    def step(c, xs):
        f, a = xs
        c2, m = vft_step(c, f, params)
        c = jax.tree.map(lambda new, old: jnp.where(a, new, old), c2, c)
        m = m & a
        return c, (m, m.sum().astype(jnp.float32))

    return jax.lax.scan(step, carry, (frames, active))


@partial(jax.jit, static_argnames=("params",))
def vft_scan(init_frames, frames, active=None, params: VFTParams = VFTParams()):
    """Full VFT pass: initialize from init_frames, scan over frames.

    ``active`` (T,) bool marks real frames; inactive steps (padding to a
    bucketed length, or frames the reference skips at features.py:112-119)
    pass the carry through untouched and emit an empty mask.
    Returns (masks (T, H, W) bool, areas (T,) f32).
    """
    carry = vft_initialize(init_frames, params)
    _, (masks, areas) = vft_scan_carry(carry, frames, active, params=params)
    return masks, areas


def _bbox_mask(h: int, w: int, valid, box):
    """255-inside-bbox mask (tracker.py:159-165); empty when not valid."""
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    m = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
    return m & valid


def ygvft_initialize(init_frames, first_valid, first_box, p: YGVFTParams):
    """Seed carry (tracker.py:183-203): lmap from mean absdiff; threshold from
    the percentile of the LAST init frame inside the first bbox (whole frame
    if no bbox yet)."""
    ff = init_frames.astype(jnp.float32)
    n, h, w = ff.shape
    avg = jnp.abs(ff[1:] - ff[:-1]).sum(0) / (n - 1)
    lmap = gaussian_blur(avg, p.gaussian_ksize)
    roi = _bbox_mask(h, w, first_valid, first_box)
    roi_any = roi.any()
    sel = jnp.where(roi_any, roi, jnp.ones_like(roi))
    thresh = _roi_percentile(ff[-1], sel, p.glottal_percentile, 127.0, min_px=0)
    return ff[-1], lmap, thresh


def ygvft_step(carry, frame, valid, box, p: YGVFTParams):
    """One YOLO-guided VFT frame (tracker.py:205-232)."""
    prev, lmap, thresh = carry
    ff = frame.astype(jnp.float32)
    h, w = ff.shape
    d = gaussian_blur(jnp.abs(ff - prev), p.gaussian_ksize)
    lmap = p.alpha * d + (1.0 - p.alpha) * lmap
    roi = _bbox_mask(h, w, valid, box)
    cur = _roi_percentile(ff, roi, p.glottal_percentile, thresh, min_px=10)
    thresh = p.beta * thresh + (1.0 - p.beta) * cur
    raw = (ff < thresh) & roi
    mask = top_n_blobs(raw, p.max_glottal_components)
    return (ff, lmap, thresh), mask


# ── Parallel (frame-axis batched) tracker formulation ────────────────────────
#
# Both trackers' recurrences are LINEAR, so the sequential scans decompose
# into batched ops + parallel prefix scans (the TPU "sequence parallel" story
# for the stateful video axis, SURVEY.md §5):
#
#   lmap_t   = α·d_t + (1-α)·lmap_{t-1}            (linear; d_t batched,
#              prefix via associative_scan — the heavy (T,H,W) recurrence)
#   thresh_t = β·thresh_{t-1} + (1-β)·cur_t        (cur_t depends only on
#              frame_t and roi_t, never on thresh; fallback when the ROI has
#              ≤10 px re-feeds thresh_{t-1} as cur_t, tracker.py:109).  The
#              thresh chain is T SCALARS — it runs as a sequential lax.scan
#              (_thresh_chain) to stay bit-identical with the sequential
#              formulation; see _thresh_chain's docstring.
#
# Everything else (absdiff+blur, ROI blobs, percentiles, output blob filter)
# is per-frame independent and vmaps.  Identical results to the sequential
# scans up to float reassociation (pinned by tests).


def _linear_prefix(a, b, x0):
    """x_t = a_t·x_{t-1} + b_t for t=0..T-1 given x_{-1}=x0, via parallel
    prefix.  a: (T, ...) broadcastable to b: (T, ...)."""
    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    ca, cb = jax.lax.associative_scan(combine, (a, b))
    return ca * x0 + cb


def _thresh_chain(thresh0, cur, n_px, active, beta):
    """Sequential scalar threshold EMA, bit-identical to the sequential
    scans' update (incl. the fallback step computing β·t + (1-β)·t, which is
    not exactly t in f32).  The associative-scan form reassociates the chain
    by ~1 ulp — enough to flip (integer_pixel < thresh) for a whole pixel
    population when the threshold rides an integer boundary, so the scalar
    chain (T scalar FMAs, negligible next to the batched image work) runs
    sequentially."""
    def step(th, xs):
        cur_, npx_, act_ = xs
        c = jnp.where(npx_ > 10, cur_, th)
        th2 = beta * th + (1.0 - beta) * c
        th = jnp.where(act_, th2, th)
        return th, th

    # unroll: 5 scalar ops per step — loop-overhead bound on TPU; unrolling
    # keeps results bit-identical (steps still run in order)
    _, out = jax.lax.scan(step, thresh0, (cur, n_px, active), unroll=16)
    return out


def _prev_chain(init_last, frames):
    """prev_t for each step: frames[t-1], seeded with the last init frame."""
    return jnp.concatenate([init_last[None], frames[:-1]], axis=0)


@partial(jax.jit, static_argnames=("params",))
def ygvft_parallel(init_frames, first_valid, first_box, frames, valids, boxes,
                   active=None, params: YGVFTParams = YGVFTParams()):
    """Frame-parallel YOLO-guided VFT — same outputs as :func:`ygvft_scan`
    (float-reassociation tolerance), but every stage batched over T.

    ``active`` may only disable a contiguous TAIL (padding); interior gaps
    would change the prev-frame chain.

    Every data-dependent stage is confined to the per-frame bbox ROI, so on
    frames >= 128² the whole tail (masked percentile, threshold compare,
    top-n blob filter) runs on a 128² window positioned to contain each box
    plus a 1-px in-frame margin — 4x fewer pixels on 256² video, and the
    full-frame mask paint-back is DCE'd by XLA when callers only consume
    areas (the fused pipeline graph).  Bit-identical to the full-frame pass:
    the ROI (hence the percentile's masked pixel set and the raw mask) is
    empty outside the window, and the blob machinery's window/full
    equivalence — including hole semantics at the window border — is argued
    and test-pinned at ops/blobs.top_n_blobs_batch_roi.  An in-graph
    lax.cond falls back to the full-frame pass when any box exceeds win-2
    on a side (one branch executes).

    Note the sequential form's lmap EMA is dead state for YGVFT (the
    reference keeps updating the motion map but its ROI is always the bbox,
    tracker.py:205-232) — XLA DCEs the absdiff/blur/prefix here.
    """
    p = params
    t, h, w = frames.shape
    if active is None:
        active = jnp.ones((t,), jnp.bool_)
    prev0, lmap0, thresh0 = ygvft_initialize(init_frames, first_valid,
                                             first_box, p)

    ff = frames.astype(jnp.float32)
    d = gaussian_blur(jnp.abs(ff - _prev_chain(prev0, ff)), p.gaussian_ksize)
    # inactive steps keep the carry: a=1, b=0
    a_l = jnp.where(active[:, None, None], 1.0 - p.alpha, 1.0)
    b_l = jnp.where(active[:, None, None], p.alpha * d, 0.0)
    lmaps = _linear_prefix(a_l, b_l, lmap0[None])
    del lmaps  # dead for YGVFT (bbox ROI); kept for symmetry with the scan

    def roi_for(rows, cols):
        return ((rows >= boxes[:, 1, None, None])
                & (rows < boxes[:, 3, None, None])
                & (cols >= boxes[:, 0, None, None])
                & (cols < boxes[:, 2, None, None])
                & valids[:, None, None])

    def tail(ffx, roix, origin):
        # bit-search exact percentile (ops/histogram.py): counts instead of
        # a per-frame sort (~80 ms/512 frames) or scatter-add histogram
        # (~355 ms); identical masked pixel set windowed or full
        cur, n_px = masked_percentile_u8_batch(ffx, roix,
                                               p.glottal_percentile)
        thresh = _thresh_chain(jnp.asarray(thresh0), cur, n_px, active,
                               p.beta)
        raw = (ffx < thresh[:, None, None]) & roix & active[:, None, None]
        masks_x = top_n_blobs_batch(raw, p.max_glottal_components)
        areas = masks_x.sum((1, 2)).astype(jnp.float32)
        if origin is None:
            return masks_x, areas
        oy, ox = origin
        masks = jax.vmap(
            lambda s, yy, xx: jax.lax.dynamic_update_slice(
                jnp.zeros((h, w), jnp.bool_), s, (yy, xx)))(masks_x, oy, ox)
        return masks, areas

    def full(ffx):
        rows = jnp.arange(h)[None, :, None]
        cols = jnp.arange(w)[None, None, :]
        return tail(ffx, roi_for(rows, cols), None)

    win = 128
    if h < win or w < win:
        return full(ff)

    fits, oy, ox = roi_window_origin(boxes, h, w, win)

    def windowed(ffx):
        ff_w = jax.vmap(lambda fr, yy, xx: jax.lax.dynamic_slice(
            fr, (yy, xx), (win, win)))(ffx, oy, ox)
        rows = oy[:, None, None] + jnp.arange(win)[None, :, None]
        cols = ox[:, None, None] + jnp.arange(win)[None, None, :]
        return tail(ff_w, roi_for(rows, cols), (oy, ox))

    return jax.lax.cond(fits, windowed, full, ff)


@partial(jax.jit, static_argnames=("params",))
def ygvft_parallel_multi(init_frames, first_valid, first_box, frames, valids,
                         boxes, active, params: YGVFTParams = YGVFTParams()):
    """Frame-parallel guided VFT over a BATCH of K videos in one graph —
    areas only (the cohort-serving form; masks are never materialized).

    init_frames (K, I, H, W), first_valid (K,), first_box (K, 4),
    frames (K, T, H, W), valids (K, T), boxes (K, T, 4), active (K, T)
    -> areas (K, T) f32.

    Per-video results are bit-identical to :func:`ygvft_parallel`: every
    data-dependent stage (masked percentile, threshold compare, top-n blob
    filter) is per-frame independent, so all K·T frames run flattened
    through the same batched ops; only the per-video pieces — the seed
    threshold (``ygvft_initialize``) and the scalar threshold EMA chain —
    run under ``vmap``.  The windowed/full choice is made ONCE for the whole
    batch (any oversized box anywhere sends every video down the full-frame
    pass) — both branches are bit-identical by the window/full equivalence
    pinned at ops/blobs.top_n_blobs_batch_roi, so the shared choice only
    affects speed, never values.

    The motion-map EMA (prev/lmap carries) is dead state for YGVFT — the ROI
    is always the bbox (reference tracker.py:205-232).  ``ygvft_parallel``
    computes it and lets XLA DCE it; here only ``ygvft_initialize``'s copy
    exists (vmapped), likewise DCE'd.
    """
    p = params
    k, t, h, w = frames.shape
    _, _, thresh0 = jax.vmap(
        lambda f, v, b: ygvft_initialize(f, v, b, p))(
        init_frames, first_valid, first_box)

    ff = frames.astype(jnp.float32).reshape(k * t, h, w)
    boxes_f = boxes.reshape(k * t, 4)
    valids_f = valids.reshape(k * t)
    active_f = active.reshape(k * t)

    def roi_for(rows, cols):
        return ((rows >= boxes_f[:, 1, None, None])
                & (rows < boxes_f[:, 3, None, None])
                & (cols >= boxes_f[:, 0, None, None])
                & (cols < boxes_f[:, 2, None, None])
                & valids_f[:, None, None])

    def tail(ffx, roix):
        cur, n_px = masked_percentile_u8_batch(ffx, roix,
                                               p.glottal_percentile)
        thresh = jax.vmap(
            lambda th0, c, n_, a: _thresh_chain(th0, c, n_, a, p.beta))(
            thresh0, cur.reshape(k, t), n_px.reshape(k, t), active)
        raw = ((ffx < thresh.reshape(k * t)[:, None, None])
               & roix & active_f[:, None, None])
        masks_x = top_n_blobs_batch(raw, p.max_glottal_components)
        return masks_x.sum((1, 2)).astype(jnp.float32).reshape(k, t)

    def full(ffx):
        rows = jnp.arange(h)[None, :, None]
        cols = jnp.arange(w)[None, None, :]
        return tail(ffx, roi_for(rows, cols))

    win = 128
    if h < win or w < win:
        return full(ff)

    fits, oy, ox = roi_window_origin(boxes_f, h, w, win)

    def windowed(ffx):
        ff_w = jax.vmap(lambda fr, yy, xx: jax.lax.dynamic_slice(
            fr, (yy, xx), (win, win)))(ffx, oy, ox)
        rows = oy[:, None, None] + jnp.arange(win)[None, :, None]
        cols = ox[:, None, None] + jnp.arange(win)[None, None, :]
        return tail(ff_w, roi_for(rows, cols))

    return jax.lax.cond(fits, windowed, full, ff)


@partial(jax.jit, static_argnames=("params",))
def vft_parallel(init_frames, frames, active=None,
                 params: VFTParams = VFTParams()):
    """Frame-parallel VFT — same outputs as :func:`vft_scan` up to float
    reassociation.  ``active`` may only disable a PREFIX (the init frames the
    caller overlays) and/or a contiguous tail (padding): the lmap/threshold
    recurrences treat inactive steps as identity, matching the scan."""
    p = params
    t, h, w = frames.shape
    if active is None:
        active = jnp.ones((t,), jnp.bool_)
    prev0, lmap0, thresh0 = vft_initialize(init_frames, p)

    ff = frames.astype(jnp.float32)
    # prev chain: inactive prefix steps must not disturb it — the scan's
    # carry keeps prev = init frame until the first active step, then
    # follows frames; a prefix of inactive steps therefore maps to the same
    # chain as long as callers pass the same frames the scan would see.
    d = gaussian_blur(jnp.abs(ff - _prev_chain(prev0, ff)), p.gaussian_ksize)
    a_l = jnp.where(active[:, None, None], 1.0 - p.alpha, 1.0)
    b_l = jnp.where(active[:, None, None], p.alpha * d, 0.0)
    lmaps = _linear_prefix(a_l, b_l, lmap0[None])

    peaks = lmaps.max((1, 2))
    rthr = jnp.where(peaks > 0, peaks * p.roi_threshold_ratio, 1.0)
    roi = largest_blob_batch(lmaps > rthr[:, None, None])

    # bit-search exact percentile (ops/histogram.py): counts instead of a
    # per-frame sort (~80 ms/512 frames) or scatter-add histogram (~355 ms)
    cur, n_px = masked_percentile_u8_batch(ff, roi, p.glottal_percentile)
    thresh = _thresh_chain(jnp.asarray(thresh0), cur, n_px, active, p.beta)

    raw = (ff < thresh[:, None, None]) & roi & active[:, None, None]
    masks = top_n_blobs_batch(raw, p.max_glottal_components)
    return masks, masks.sum((1, 2)).astype(jnp.float32)


@partial(jax.jit, static_argnames=("params",))
def ygvft_scan_carry(carry, frames, valids, boxes, active=None,
                     params: YGVFTParams = YGVFTParams()):
    """Segment-resumable YOLO-guided VFT scan from an explicit carry
    (prev, lmap, thresh); returns the updated carry.  Chained segment calls
    are bit-identical to one :func:`ygvft_scan` over the concatenation.

    Returns (carry, (masks (T, H, W) bool, areas (T,) f32))."""
    if active is None:
        active = jnp.ones((frames.shape[0],), jnp.bool_)

    def step(c, xs):
        f, v, b, a = xs
        c2, m = ygvft_step(c, f, v, b, params)
        c = jax.tree.map(lambda new, old: jnp.where(a, new, old), c2, c)
        m = m & a
        return c, (m, m.sum().astype(jnp.float32))

    return jax.lax.scan(step, carry, (frames, valids, boxes, active))


@partial(jax.jit, static_argnames=("params",))
def ygvft_scan(init_frames, first_valid, first_box, frames, valids, boxes,
               active=None, params: YGVFTParams = YGVFTParams()):
    """Full YOLO-guided VFT pass.

    init_frames: (N, H, W); frames: (T, H, W); valids: (T,) bool;
    boxes: (T, 4) i32 gated YOLO boxes; ``active`` marks real (non-padding)
    frames.  Returns (masks, areas).
    """
    carry = ygvft_initialize(init_frames, first_valid, first_box, params)
    _, (masks, areas) = ygvft_scan_carry(carry, frames, valids, boxes,
                                         active, params=params)
    return masks, areas
