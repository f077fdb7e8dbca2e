"""Tracker scans vs a cv2/numpy oracle transcribed from the documented
reference semantics (openglottal/models/tracker.py)."""

import cv2
import numpy as np
import jax.numpy as jnp

from openglottal_tpu.data.synthetic import synthetic_video, synthetic_gt_boxes
from openglottal_tpu.data.video import bgr_to_gray_u8
from openglottal_tpu.models.tracker import (
    VFTParams, YGVFTParams, vft_scan, ygvft_scan,
)


def _blob_cv(m):
    cs, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    out = np.zeros_like(m)
    if cs:
        cv2.drawContours(out, [max(cs, key=cv2.contourArea)], -1, 255, cv2.FILLED)
    return out


def _nblobs_cv(m, n):
    cs, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    out = np.zeros_like(m)
    if cs:
        cv2.drawContours(out, sorted(cs, key=cv2.contourArea, reverse=True)[:n],
                         -1, 255, cv2.FILLED)
    return out


class _VFTOracle:
    def __init__(self, p: VFTParams):
        self.p = p

    def initialize(self, frames):
        p = self.p
        ff = [f.astype(np.float32) for f in frames]
        avg = sum(cv2.absdiff(ff[i], ff[i - 1]) for i in range(1, len(ff))) / (len(ff) - 1)
        self.lmap = cv2.GaussianBlur(avg, (p.gaussian_ksize,) * 2, 0)
        peak = self.lmap.max()
        rthr = peak * p.roi_threshold_ratio if peak > 0 else 1.0
        _, rm = cv2.threshold(self.lmap, rthr, 255, cv2.THRESH_BINARY)
        rm = _blob_cv(rm.astype(np.uint8))
        px = frames[0][rm == 255]
        self.thresh = float(np.percentile(px, p.glottal_percentile)) if px.size else 127.0
        self.prev = ff[-1]

    def step(self, frame):
        p = self.p
        ff = frame.astype(np.float32)
        d = cv2.GaussianBlur(cv2.absdiff(ff, self.prev), (p.gaussian_ksize,) * 2, 0)
        self.lmap = p.alpha * d + (1 - p.alpha) * self.lmap
        peak = self.lmap.max()
        rthr = peak * p.roi_threshold_ratio if peak > 0 else 1.0
        _, rr = cv2.threshold(self.lmap, rthr, 255, cv2.THRESH_BINARY)
        roi = _blob_cv(rr.astype(np.uint8))
        px = frame[roi == 255]
        cur = float(np.percentile(px, p.glottal_percentile)) if px.size > 10 else self.thresh
        self.thresh = p.beta * self.thresh + (1 - p.beta) * cur
        raw = np.zeros_like(frame, np.uint8)
        raw[(frame < self.thresh) & (roi == 255)] = 255
        self.prev = ff
        return _nblobs_cv(raw, p.max_glottal_components)


def _gray_video(t=40, size=96):
    frames_bgr, _ = synthetic_video(t=t, size=size, center=(48.0, 48.0), seed=3)
    return np.asarray(bgr_to_gray_u8(frames_bgr))


def test_vft_matches_oracle():
    """The EMA/percentile state recursion must match the oracle exactly;
    output areas agree within tie noise (cv2 ranks 1-px specks by
    contourArea==0.0 in arbitrary order — see ops/blobs.py docstring)."""
    from openglottal_tpu.models.tracker import vft_initialize, vft_step

    p = VFTParams()
    gray = _gray_video()
    oracle = _VFTOracle(p)
    oracle.initialize([gray[0], gray[1]])

    frames = jnp.asarray(gray.astype(np.float32))
    carry = vft_initialize(frames[:2], p)
    np.testing.assert_allclose(float(carry[2]), oracle.thresh, atol=1e-3)
    got_areas, want_areas = [], []
    for t in range(2, len(gray)):
        want_areas.append(float((oracle.step(gray[t]) > 0).sum()))
        carry, mask = vft_step(carry, frames[t], p)
        got_areas.append(float(mask.sum()))
        # state recursion bit-comparable every frame
        np.testing.assert_allclose(float(carry[2]), oracle.thresh, atol=1e-2)
        np.testing.assert_allclose(np.asarray(carry[1]), oracle.lmap, atol=1e-3)
    np.testing.assert_allclose(got_areas, want_areas, atol=10.0)

    # and the jitted scan equals the manual stepping
    _, areas = vft_scan(frames[:2], frames[2:], params=p)
    np.testing.assert_allclose(np.asarray(areas), got_areas, atol=0.5)


class _YGVFTOracle:
    def __init__(self, p: YGVFTParams):
        self.p = p

    def _bbox_mask(self, shape, bbox):
        m = np.zeros(shape[:2], np.uint8)
        if bbox is not None:
            x1, y1, x2, y2 = (int(v) for v in bbox)
            m[y1:y2, x1:x2] = 255
        return m

    def initialize(self, frames, bbox):
        p = self.p
        ff = [f.astype(np.float32) for f in frames]
        diffs = [cv2.absdiff(ff[i], ff[i - 1]) for i in range(1, len(ff))]
        self.lmap = cv2.GaussianBlur(sum(diffs) / len(diffs), (p.gaussian_ksize,) * 2, 0)
        roi = self._bbox_mask(frames[0].shape, bbox)
        px = frames[-1][roi == 255] if roi.any() else frames[-1].ravel()
        self.thresh = float(np.percentile(px, p.glottal_percentile)) if px.size else 127.0
        self.prev = ff[-1]

    def step(self, frame, bbox):
        p = self.p
        ff = frame.astype(np.float32)
        d = cv2.GaussianBlur(cv2.absdiff(ff, self.prev), (p.gaussian_ksize,) * 2, 0)
        self.lmap = p.alpha * d + (1 - p.alpha) * self.lmap
        roi = self._bbox_mask(frame.shape, bbox)
        px = frame[roi == 255]
        cur = float(np.percentile(px, p.glottal_percentile)) if px.size > 10 else self.thresh
        self.thresh = p.beta * self.thresh + (1 - p.beta) * cur
        raw = np.zeros_like(frame, np.uint8)
        raw[(frame < self.thresh) & (roi == 255)] = 255
        self.prev = ff
        return _nblobs_cv(raw, p.max_glottal_components)


def test_parallel_formulation_matches_scan():
    """The frame-parallel tracker (linear recurrences via associative_scan,
    everything else vmapped) must reproduce the sequential scan exactly —
    the empty-ROI threshold fallback is the identity step, so linearity
    holds (models/tracker.py docstring)."""
    from openglottal_tpu.models.tracker import (
        ygvft_parallel, vft_parallel,
    )

    p = YGVFTParams()
    frames_bgr, gt = synthetic_video(t=24, size=96, center=(48.0, 48.0), seed=8)
    gray = jnp.asarray(np.asarray(bgr_to_gray_u8(frames_bgr)).astype(np.float32))
    boxes = synthetic_gt_boxes(gt, dilate=6)
    valids = jnp.asarray(boxes[:, 0] >= 0)
    boxes_i = jnp.asarray(np.where(boxes[:, :1] >= 0, boxes, 0).astype(np.int32))

    _, seq = ygvft_scan(gray[:2], jnp.asarray(True), boxes_i[0],
                        gray[2:], valids[2:], boxes_i[2:], params=p)
    _, par = ygvft_parallel(gray[:2], jnp.asarray(True), boxes_i[0],
                            gray[2:], valids[2:], boxes_i[2:], params=p)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq), atol=0.5)

    pv = VFTParams()
    active = jnp.arange(gray.shape[0]) >= 2
    _, seq_v = vft_scan(gray[:2], gray, active, params=pv)
    _, par_v = vft_parallel(gray[:2], gray, active, params=pv)
    np.testing.assert_allclose(np.asarray(par_v), np.asarray(seq_v), atol=0.5)


def test_ygvft_windowed_tail_matches_scan():
    """On >=128² frames ygvft_parallel confines its whole tail (percentile ->
    threshold -> blob filter) to a 128² box-anchored window.  Masks must be
    BIT-identical and areas equal (reassociation tolerance) to the
    sequential scan — for the windowed branch (small boxes, incl. a
    frame-corner box), and for the in-graph full-frame fallback (one box
    wider than win-2)."""
    from openglottal_tpu.models.tracker import ygvft_parallel

    p = YGVFTParams()
    rng = np.random.default_rng(4)
    T, H, W = 10, 256, 256
    frames = jnp.asarray((rng.random((T, H, W)) * 255).round().astype(np.float32))
    init = jnp.asarray((rng.random((2, H, W)) * 255).round().astype(np.float32))
    valids = jnp.asarray(rng.random(T) < 0.8)
    x0 = rng.integers(0, 160, T)
    y0 = rng.integers(0, 160, T)
    small = np.stack([x0, y0, x0 + rng.integers(5, 96, T),
                      y0 + rng.integers(5, 96, T)], -1).astype(np.int32)
    small[0] = [0, 0, 60, 40]          # frame-corner box
    big = small.copy()
    big[3] = [5, 5, 230, 200]          # > win-2 -> full-frame fallback

    for boxes in (jnp.asarray(small), jnp.asarray(big)):
        mp, ap = ygvft_parallel(init, jnp.asarray(True), boxes[0],
                                frames, valids, boxes, params=p)
        ms, as_ = ygvft_scan(init, jnp.asarray(True), boxes[0],
                             frames, valids, boxes, params=p)
        np.testing.assert_array_equal(np.asarray(mp), np.asarray(ms))
        np.testing.assert_allclose(np.asarray(ap), np.asarray(as_), atol=0.5)


def test_vft_matches_reference_code():
    """State trajectory vs the ACTUAL reference VocalFoldTracker loaded from
    /root/reference (cv2+numpy only — importable without ultralytics).  The
    transcription oracles above document the semantics; this pins parity to
    the reference's own code."""
    from ref_loader import load_reference_module
    from openglottal_tpu.models.tracker import vft_initialize, vft_step

    ref = load_reference_module("models.tracker")
    p = VFTParams()
    gray = _gray_video()
    trk = ref.VocalFoldTracker()
    trk.initialize([gray[0], gray[1]])

    frames = jnp.asarray(gray.astype(np.float32))
    carry = vft_initialize(frames[:2], p)
    np.testing.assert_allclose(float(carry[2]), trk.thresh, atol=1e-3)
    got_areas, want_areas = [], []
    for t in range(2, len(gray)):
        want_areas.append(float((trk.process_frame(gray[t]) > 0).sum()))
        carry, mask = vft_step(carry, frames[t], p)
        got_areas.append(float(mask.sum()))
        np.testing.assert_allclose(float(carry[2]), trk.thresh, atol=1e-2)
        np.testing.assert_allclose(np.asarray(carry[1]), trk.lmap, atol=1e-3)
    np.testing.assert_allclose(got_areas, want_areas, atol=10.0)


def test_ygvft_matches_reference_code():
    """Same for YOLOGuidedVFT, with the production percentile=30
    (features.py:23-29 overrides the class default of 5)."""
    from ref_loader import load_reference_module

    ref = load_reference_module("models.tracker")
    p = YGVFTParams()
    frames_bgr, gt = synthetic_video(t=40, size=96, center=(48.0, 48.0), seed=4)
    gray = np.asarray(bgr_to_gray_u8(frames_bgr))
    boxes = synthetic_gt_boxes(gt, dilate=6)
    valids = boxes[:, 0] >= 0
    boxes_i = np.where(valids[:, None], boxes, 0).astype(np.int32)

    trk = ref.YOLOGuidedVFT(glottal_percentile=int(p.glottal_percentile))
    fb = tuple(boxes[0]) if valids[0] else (tuple(boxes[1]) if valids[1] else None)
    trk.initialize([gray[0], gray[1]], fb)
    want = [float((trk.process_frame(g, tuple(b) if v else None) > 0).sum())
            for g, v, b in zip(gray[2:], valids[2:], boxes[2:])]

    f32 = jnp.asarray(gray.astype(np.float32))
    fi = int(np.argmax(valids[:2])) if valids[:2].any() else 0
    _, areas = ygvft_scan(
        f32[:2], jnp.asarray(bool(valids[:2].any())), jnp.asarray(boxes_i[fi]),
        f32[2:], jnp.asarray(valids[2:]), jnp.asarray(boxes_i[2:]), params=p,
    )
    got = np.asarray(areas)
    want = np.asarray(want)
    big = want > 50
    assert big.any(), "synthetic video produced no substantial masks"
    np.testing.assert_allclose(got[big], want[big], rtol=0.05, atol=5.0)
    np.testing.assert_allclose(got, want, atol=15.0)


def test_ygvft_matches_oracle():
    p = YGVFTParams()
    frames_bgr, gt = synthetic_video(t=40, size=96, center=(48.0, 48.0), seed=4)
    gray = np.asarray(bgr_to_gray_u8(frames_bgr))
    boxes = synthetic_gt_boxes(gt, dilate=6)
    valids = boxes[:, 0] >= 0
    boxes_i = np.where(valids[:, None], boxes, 0).astype(np.int32)

    oracle = _YGVFTOracle(p)
    fb = tuple(boxes[0]) if valids[0] else (tuple(boxes[1]) if valids[1] else None)
    oracle.initialize([gray[0], gray[1]], fb)
    want = [float((oracle.step(g, tuple(b) if v else None) > 0).sum())
            for g, v, b in zip(gray[2:], valids[2:], boxes[2:])]

    f32 = jnp.asarray(gray.astype(np.float32))
    fi = int(np.argmax(valids[:2])) if valids[:2].any() else 0
    _, areas = ygvft_scan(
        f32[:2], jnp.asarray(bool(valids[:2].any())), jnp.asarray(boxes_i[fi]),
        f32[2:], jnp.asarray(valids[2:]), jnp.asarray(boxes_i[2:]), params=p,
    )
    got = np.asarray(areas)
    want = np.asarray(want)
    # large-mask frames must agree tightly; tiny-speck frames within tie noise
    big = want > 50
    assert big.any(), "synthetic video produced no substantial masks"
    np.testing.assert_allclose(got[big], want[big], rtol=0.05, atol=5.0)
    np.testing.assert_allclose(got, want, atol=15.0)
