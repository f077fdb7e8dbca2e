"""Temporal gate FSM vs a pure-python oracle of the reference semantics
(openglottal/models/detector.py:52-96)."""

import numpy as np

from openglottal_tpu.models.gate import GateParams, gate_scan, gate_single

RNG = np.random.default_rng(3)


class _Oracle:
    """Python transcription of the documented FSM semantics (test oracle)."""

    def __init__(self, max_shift=30.0, padding=8, max_hold=3):
        self.ms, self.p, self.mh = max_shift, padding, max_hold
        self.reset()

    def reset(self):
        self.cx = self.cy = None
        self.w = self.h = None
        self.miss = 0

    def step(self, det, H, W):
        new = None
        if det is not None:
            x1, y1, x2, y2 = det
            ncx, ncy = (x1 + x2) / 2, (y1 + y2) / 2
            nw = int(x2 - x1) + 2 * self.p
            nh = int(y2 - y1) + 2 * self.p
            new = (ncx, ncy, nw, nh)
            if self.cx is not None and np.hypot(ncx - self.cx, ncy - self.cy) > self.ms:
                new = None
        if new is not None:
            self.cx, self.cy, self.w, self.h = new
            self.miss = 0
        elif self.cx is not None:
            self.miss += 1
            if self.miss > self.mh:
                self.reset()
                return None
        if self.cx is None:
            return None
        hw, hh = self.w // 2, self.h // 2
        cx = int(np.clip(self.cx, hw, W - hw))
        cy = int(np.clip(self.cy, hh, H - hh))
        return (cx - hw, cy - hh, cx + hw, cy + hh)


def _random_sequence(t=200, H=256, W=256):
    has = RNG.random(t) > 0.25
    cx = np.cumsum(RNG.normal(0, 18, t)) % W
    cy = np.cumsum(RNG.normal(0, 18, t)) % H
    w = RNG.uniform(8, 60, t)
    h = RNG.uniform(8, 60, t)
    x1 = np.clip(cx - w / 2, 0, W - 1)
    y1 = np.clip(cy - h / 2, 0, H - 1)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    return has, boxes


def test_gate_scan_matches_oracle():
    for trial in range(5):
        has, boxes = _random_sequence()
        oracle = _Oracle()
        want = [oracle.step(tuple(b) if h else None, 256, 256)
                for h, b in zip(has, boxes)]
        ov, ob = gate_scan(has, boxes, 256, 256)
        ov, ob = np.asarray(ov), np.asarray(ob)
        for t, w_ in enumerate(want):
            if w_ is None:
                assert not ov[t], f"trial {trial} frame {t}: expected None"
            else:
                assert ov[t], f"trial {trial} frame {t}: expected box"
                assert tuple(ob[t]) == w_, f"trial {trial} frame {t}: {tuple(ob[t])} != {w_}"


def test_gate_hold_then_zero():
    """3 misses hold the box, the 4th zeroes and resets (detector.py:80-86)."""
    has = np.array([True] + [False] * 6 + [True])
    box = np.array([100.0, 100.0, 140.0, 150.0], np.float32)
    boxes = np.tile(box, (8, 1))
    ov, ob = gate_scan(has, boxes, 256, 256, params=GateParams(30.0, 8, 3))
    ov = np.asarray(ov)
    assert ov[0] and ov[1] and ov[2] and ov[3]       # detection + 3 held frames
    assert not ov[4] and not ov[5] and not ov[6]      # zeroed
    assert ov[7]                                      # re-acquired fresh
    # re-acquisition is fresh: no drift clamp applies even far away
    has2 = np.array([True] + [False] * 4 + [True])
    far = np.tile(np.array([10.0, 10.0, 30.0, 30.0], np.float32), (6, 1))
    far[5] = [200.0, 200.0, 230.0, 230.0]
    ov2, ob2 = gate_scan(has2, far, 256, 256)
    assert np.asarray(ov2)[5]


def test_gate_drift_clamp():
    has = np.array([True, True])
    boxes = np.array([[100, 100, 120, 120], [180, 180, 200, 200]], np.float32)
    ov, ob = gate_scan(has, boxes, 256, 256)
    ob = np.asarray(ob)
    # second frame rejected (jump 113 > 30): holds first box
    assert np.asarray(ov)[1]
    assert tuple(ob[1]) == tuple(ob[0])


def test_gate_single_equals_reset_per_frame():
    has, boxes = _random_sequence(50)
    ov, ob = gate_single(has, boxes, 256, 256)
    ov, ob = np.asarray(ov), np.asarray(ob)
    for t in range(50):
        oracle = _Oracle()
        want = oracle.step(tuple(boxes[t]) if has[t] else None, 256, 256)
        if want is None:
            assert not ov[t]
        else:
            assert ov[t] and tuple(ob[t]) == want
