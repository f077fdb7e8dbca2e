"""Evaluation core: metrics batch vs the reference's TP/FP/FN formulas,
otsu-in-box vs cv2, aggregate bookkeeping."""

import cv2
import numpy as np
import jax.numpy as jnp

from openglottal_tpu.eval import (
    aggregate,
    box_masked,
    frame_metrics_batch,
    otsu_in_box_masks,
)


def _ref_frame_metrics(pred, gt):
    """Reference formula (eval_girafe.py:113-124)."""
    p = (pred > 0).astype(np.float32).ravel()
    g = (gt > 0).astype(np.float32).ravel()
    tp = (p * g).sum()
    fp = (p * (1 - g)).sum()
    fn = ((1 - p) * g).sum()
    dice = 2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn > 0 else 1.0
    iou = tp / (tp + fp + fn) if tp + fp + fn > 0 else 1.0
    return dice, iou


def test_frame_metrics_match_reference_formula():
    rng = np.random.default_rng(17)
    pred = rng.random((6, 64, 64)) > 0.6
    gt = rng.random((6, 64, 64)) > 0.6
    pred[3] = False
    gt[3] = False  # empty∧empty -> 1.0
    d, i = frame_metrics_batch(jnp.asarray(pred), jnp.asarray(gt))
    for t in range(6):
        wd, wi = _ref_frame_metrics(pred[t], gt[t])
        assert abs(float(d[t]) - wd) < 1e-6
        assert abs(float(i[t]) - wi) < 1e-6


def test_otsu_in_box_matches_cv2():
    rng = np.random.default_rng(18)
    # bimodal crop content like a glottis
    g = rng.normal(170, 10, (2, 96, 128)).clip(0, 255)
    g[:, 30:60, 40:80] = rng.normal(40, 8, (2, 30, 40)).clip(0, 255)
    g = g.astype(np.uint8)
    boxes = np.array([[20, 10, 100, 80], [30, 20, 110, 90]], np.int32)
    valids = np.array([True, True])
    got = np.asarray(otsu_in_box_masks(jnp.asarray(g), jnp.asarray(valids),
                                       jnp.asarray(boxes)))
    for t in range(2):
        x1, y1, x2, y2 = boxes[t]
        roi = g[t, y1:y2, x1:x2]
        _, want_roi = cv2.threshold(roi, 0, 255,
                                    cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
        want = np.zeros_like(g[t])
        want[y1:y2, x1:x2] = want_roi
        np.testing.assert_array_equal(got[t], want > 0)


def test_box_masked_and_aggregate():
    m = np.ones((3, 32, 32), bool)
    boxes = np.array([[4, 4, 10, 12]] * 3, np.int32)
    valids = np.array([True, False, True])
    out = np.asarray(box_masked(jnp.asarray(m), jnp.asarray(valids),
                                jnp.asarray(boxes)))
    assert out[0].sum() == 6 * 8 and out[1].sum() == 0

    per = {"p1": {"unet-only": {"dice": np.array([1.0, 0.4]),
                                "iou": np.array([1.0, 0.3]), "det": None}},
           "p2": {"unet-only": {"dice": np.array([0.6]),
                                "iou": np.array([0.5]),
                                "det": np.array([True])}}}
    agg = aggregate(per)
    row = agg["unet-only"]
    assert abs(row["dice"] - np.mean([1.0, 0.4, 0.6])) < 1e-9
    assert row["n_frames"] == 3
    assert abs(row["dice50"] - 200 / 3) < 1e-6
