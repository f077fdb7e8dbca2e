"""Batched evaluation core for the GIRAFE / BAGLS protocols.

Reference protocols:
  * scripts/eval_girafe.py — per-patient sequential detector state (reset per
    patient, :243-247), five pipelines per frame (:263-308), YOLOGuidedVFT per
    patient with init frames excluded from metrics (:176-220), per-frame
    Dice/IoU with the TP/FP/FN form (:113-124).
  * scripts/eval_bagls.py — detector reset per frame (:160-166; BAGLS test
    frames have no temporal order), images+GT letterboxed identically to 256²,
    detection TP/FP/FN bookkeeping = GT pixels inside predicted box (:173-191).

TPU re-architecture: per patient, one batched YOLO pass + one gate scan + one
batched U-Net pass + vectorized per-frame metrics — no per-frame Python.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from openglottal_tpu.ops.histogram import otsu_threshold
from openglottal_tpu.pipelines import GlottalPipelines

PIPELINES = ["unet-only", "yolo+otsu", "yolo+unet", "yolo-crop+unet", "yolo+motion"]


@jax.jit
def frame_metrics_batch(pred, gt):
    """Per-frame (dice, iou) with empty∧empty=1.0 (eval_girafe.py:113-124).

    pred, gt: (T, H, W) binary.  Returns (dice (T,), iou (T,))."""
    p = (pred > 0).astype(jnp.float32)
    g = (gt > 0).astype(jnp.float32)
    tp = (p * g).sum((1, 2))
    fp = (p * (1 - g)).sum((1, 2))
    fn = ((1 - p) * g).sum((1, 2))
    dice = jnp.where(2 * tp + fp + fn > 0, 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-9), 1.0)
    iou = jnp.where(tp + fp + fn > 0, tp / jnp.maximum(tp + fp + fn, 1e-9), 1.0)
    return dice, iou


@jax.jit
def otsu_in_box_masks(gray_u8, valids, boxes):
    """Batched YOLO+OTSU baseline (eval_girafe.py:162-171): Otsu threshold
    *inverted* (glottis dark) inside each gated box; empty when no box."""
    t, h, w = gray_u8.shape
    rows = jnp.arange(h)
    cols = jnp.arange(w)

    def one(g, v, b):
        inbox = ((rows >= b[1]) & (rows < b[3]))[:, None] & \
                ((cols >= b[0]) & (cols < b[2]))[None, :]
        thr = otsu_threshold(g, inbox)  # single Otsu source (ops/histogram.py)
        return (g.astype(jnp.float32) <= thr) & inbox & v  # THRESH_BINARY_INV

    return jax.vmap(one)(gray_u8, valids, boxes)


@jax.jit
def box_masked(masks, valids, boxes):
    """Zero the mask outside the gated box (YOLO+UNet, eval_girafe.py:284-296)."""
    t, h, w = masks.shape
    rows = jnp.arange(h)
    cols = jnp.arange(w)

    def one(m, v, b):
        inbox = ((rows >= b[1]) & (rows < b[3]))[:, None] & \
                ((cols >= b[0]) & (cols < b[2]))[None, :]
        return m & inbox & v

    return jax.vmap(one)(masks, valids, boxes)


def evaluate_patient(pipe: GlottalPipelines, frames_bgr, gt_masks,
                     sequential: bool = True, crop: bool = True):
    """All five pipelines on one patient's (sorted) frames.

    Returns dict pipeline -> {dice: (T,), iou: (T,), det: (T,) or None}.
    yolo+motion excludes the YGVFT_INIT seed frames from metrics
    (eval_girafe.py:205-213) — its arrays are shorter by YGVFT_INIT.
    """
    from openglottal_tpu.data.video import bgr_to_gray_u8
    from openglottal_tpu.pipelines import YGVFT_INIT, to_device

    frames_bgr = to_device(np.asarray(frames_bgr))
    gt = to_device(np.asarray(gt_masks))
    gray = bgr_to_gray_u8(frames_bgr)
    out = {}

    unet_masks = pipe.segment_video(gray)
    d, i = frame_metrics_batch(unet_masks, gt)
    out["unet-only"] = {"dice": np.asarray(d), "iou": np.asarray(i), "det": None}

    if pipe.yolo_variables is None:
        return out

    valid, boxes = pipe.gated_boxes(frames_bgr, sequential=sequential)
    det = np.asarray(valid)

    otsu = otsu_in_box_masks(gray, valid, boxes)
    d, i = frame_metrics_batch(otsu, gt)
    out["yolo+otsu"] = {"dice": np.asarray(d), "iou": np.asarray(i), "det": det}

    yu = box_masked(unet_masks, valid, boxes)
    d, i = frame_metrics_batch(yu, gt)
    out["yolo+unet"] = {"dice": np.asarray(d), "iou": np.asarray(i), "det": det}

    if crop and pipe.crop_unet_variables is not None:
        cm, _, _ = pipe.crop_unet_masks(frames_bgr, gray_u8=gray,
                                        valid=valid, boxes=boxes)
        d, i = frame_metrics_batch(cm, gt)
        out["yolo-crop+unet"] = {"dice": np.asarray(d), "iou": np.asarray(i),
                                 "det": det}

    # motion pipeline: one YGVFT pass (frame-parallel on the fast path),
    # init frames excluded from metrics AND from the det-recall frame set so
    # aggregate() counts recall over exactly the frames it scores
    t = frames_bgr.shape[0]
    if sequential and t > YGVFT_INIT:
        masks = pipe.ygvft_eval_masks(gray, valid, boxes)
        d, i = frame_metrics_batch(masks, gt[YGVFT_INIT:])
        out["yolo+motion"] = {"dice": np.asarray(d), "iou": np.asarray(i),
                              "det": det[YGVFT_INIT:]}
    return out


def aggregate(per_patient: dict, pipelines=PIPELINES) -> dict:
    """patient -> pipeline -> metrics  =>  pipeline -> summary row."""
    agg = {}
    for p in pipelines:
        dices, ious, n_det, n_tot = [], [], 0, 0
        for pat, res in per_patient.items():
            if p not in res:
                continue
            dices.extend(res[p]["dice"].tolist())
            ious.extend(res[p]["iou"].tolist())
            if res[p]["det"] is not None:
                n_det += int(res[p]["det"].sum())
                n_tot += len(res[p]["det"])
        if not dices:
            continue
        agg[p] = {
            "dice": float(np.mean(dices)),
            "iou": float(np.mean(ious)),
            "dice50": float(np.mean([x >= 0.5 for x in dices]) * 100),
            "det_recall": (n_det / n_tot) if n_tot else None,
            "n_frames": len(dices),
            "dices": dices,
            "ious": ious,
        }
    return agg
