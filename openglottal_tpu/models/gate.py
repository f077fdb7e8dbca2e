"""Temporal detection gate: the reference's TemporalDetector state machine
(openglottal/models/detector.py:9-102) re-cast as a ``lax.scan`` over
per-frame detection summaries.

The TPU pipeline first runs the YOLO detector *batched* over a whole chunk of
frames (stateless), producing per-frame (has_detection, x1, y1, x2, y2).  The
tiny order-dependent gate FSM then runs as a scan over those 5-tuples — a few
scalar ops per frame, negligible next to the model passes, but bit-exact with
the reference's sequential semantics:

  * centre drift-clamp: a fresh detection whose centre jumps more than
    ``max_shift_px`` from the previous centre is rejected (hold previous)
    (detector.py:71-74);
  * size update: every accepted detection sets the box size to the raw
    detection size + 2*padding (int-truncated, detector.py:67-69);
  * hold/zero: up to ``max_hold_frames`` consecutive misses hold the previous
    box; one more miss zeroes the gate AND resets all state so re-acquisition
    starts fresh (detector.py:80-86);
  * output clamp: the centre is clamped so the box stays inside the frame
    (detector.py:91-96; np.clip(lo>hi) -> hi semantics preserved).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GateParams(NamedTuple):
    max_shift_px: float = 30.0
    padding: int = 8
    max_hold_frames: int = 3


class GateState(NamedTuple):
    valid: jnp.ndarray      # bool   — have we a held detection?
    cx: jnp.ndarray         # f32    — previous centre x
    cy: jnp.ndarray         # f32    — previous centre y
    w: jnp.ndarray          # i32    — current box width (incl. padding)
    h: jnp.ndarray          # i32    — current box height
    miss: jnp.ndarray       # i32    — consecutive misses


def gate_init() -> GateState:
    z32 = jnp.float32(0.0)
    zi = jnp.int32(0)
    return GateState(jnp.bool_(False), z32, z32, zi, zi, zi)


def gate_step(state: GateState, det, frame_h: int, frame_w: int,
              params: GateParams):
    """One FSM step.  det = (has, x1, y1, x2, y2) floats in frame coords.

    Returns (new_state, (out_valid, box_i32[4])).
    """
    has, x1, y1, x2, y2 = det
    p = params.padding
    new_cx = (x1 + x2) * 0.5
    new_cy = (y1 + y2) * 0.5
    new_w = (x2 - x1).astype(jnp.int32) + 2 * p   # int() truncation, detector.py:68
    new_h = (y2 - y1).astype(jnp.int32) + 2 * p

    jump = jnp.hypot(new_cx - state.cx, new_cy - state.cy)
    fresh = has & (~state.valid | (jump <= params.max_shift_px))

    # miss bookkeeping (only when a previous detection exists)
    miss = jnp.where(fresh, 0, jnp.where(state.valid, state.miss + 1, state.miss))
    expired = state.valid & ~fresh & (miss > params.max_hold_frames)

    valid = (fresh | state.valid) & ~expired
    cx = jnp.where(fresh, new_cx, state.cx)
    cy = jnp.where(fresh, new_cy, state.cy)
    w = jnp.where(fresh, new_w, state.w)
    h = jnp.where(fresh, new_h, state.h)

    new_state = GateState(
        valid=valid,
        cx=jnp.where(expired, 0.0, cx),
        cy=jnp.where(expired, 0.0, cy),
        w=jnp.where(expired, 0, w),
        h=jnp.where(expired, 0, h),
        miss=jnp.where(expired, 0, miss),
    )

    # output box: clamp centre so the box stays inside the frame (detector.py:91-96)
    hw = w // 2
    hh = h // 2
    ocx = jnp.clip(cx, hw.astype(jnp.float32), jnp.float32(frame_w) - hw).astype(jnp.int32)
    ocy = jnp.clip(cy, hh.astype(jnp.float32), jnp.float32(frame_h) - hh).astype(jnp.int32)
    box = jnp.stack([ocx - hw, ocy - hh, ocx + hw, ocy + hh])
    return new_state, (valid, box)


@partial(jax.jit, static_argnums=(3, 4), static_argnames=("params",))
def gate_scan_carry(state: GateState, has, boxes, frame_h: int, frame_w: int,
                    params: GateParams = GateParams()):
    """Gate scan resumable across video segments: runs the FSM over this
    segment starting from ``state`` and returns the carry for the next one.

    The carry is the whole of the reference TemporalDetector's mutable state
    (detector.py:36-40), so feeding a video through in chunks is bit-exact
    with one scan over the concatenation — the streaming pipelines
    (pipelines.GlottalPipelines.stream_areas) rely on this.

    Returns (new_state, (out_valid (T,) bool, out_boxes (T, 4) i32)).
    """
    def step(st, xs):
        h_, b = xs
        return gate_step(st, (h_, b[0], b[1], b[2], b[3]), frame_h, frame_w,
                         params)

    # unroll: the FSM body is ~30 scalar ops, so the scan is loop-overhead
    # bound on TPU (~87 us/step measured through the relay); unrolling packs
    # 16 steps per loop trip with bit-identical results (no reassociation —
    # steps still run in order)
    return jax.lax.scan(step, state, (has, boxes.astype(jnp.float32)),
                        unroll=16)


@partial(jax.jit, static_argnums=(2, 3), static_argnames=("params",))
def gate_scan(has, boxes, frame_h: int, frame_w: int,
              params: GateParams = GateParams()):
    """Run the gate over a whole video.

    has:   (T,) bool   — YOLO produced a detection this frame.
    boxes: (T, 4) f32  — raw max-conf (x1, y1, x2, y2) per frame.

    Returns (out_valid (T,) bool, out_boxes (T, 4) i32).  Frames where
    out_valid is False correspond to the reference returning None.
    """
    _, (ov, ob) = gate_scan_carry(gate_init(), has, boxes, frame_h, frame_w,
                                  params=params)
    return ov, ob


@partial(jax.jit, static_argnums=(2, 3), static_argnames=("params",))
def gate_single(has, boxes, frame_h: int, frame_w: int,
                params: GateParams = GateParams()):
    """Stateless per-frame gate (reset before every frame).

    Mirrors eval_bagls.py:160-166 where the detector is reset per frame
    because BAGLS test frames have no temporal order.  Batched over frames.
    """
    def one(h_, b):
        _, out = gate_step(
            gate_init(), (h_, b[0], b[1], b[2], b[3]), frame_h, frame_w, params
        )
        return out

    return jax.vmap(one)(has, boxes.astype(jnp.float32))


class TemporalGate:
    """Object-style wrapper holding GateParams; mirrors the reference's
    TemporalDetector configuration surface (conf threshold applied upstream
    at YOLO postprocessing)."""

    def __init__(self, max_shift_px: float = 30.0, padding: int = 8,
                 max_hold_frames: int = 3):
        self.params = GateParams(float(max_shift_px), int(padding), int(max_hold_frames))

    def __call__(self, has, boxes, frame_h: int, frame_w: int, sequential: bool = True):
        fn = gate_scan if sequential else gate_single
        return fn(has, boxes, frame_h, frame_w, params=self.params)
