"""YOLOv8 detection loss: Task-Aligned assignment + CIoU + DFL + BCE.

The reference delegates training entirely to ultralytics
(scripts/train_yolo.py:107-121); this module owns it.  Standard v8 recipe:

  * TAL: align metric = cls_prob^0.5 · IoU^6.0; per-gt top-10 candidate
    anchors whose centre lies inside the gt box; conflicts resolved by the
    highest metric; cls targets are soft (metric normalised per gt so its
    peak equals the gt's best IoU).
  * box: CIoU loss on assigned anchors, weighted by the soft target score.
  * DFL: cross-entropy against the two integer bins bracketing each target
    ltrb distance (in stride units, clipped to REG_MAX-1).
  * weights: box 7.5, cls 0.5, dfl 1.5; normalised by the summed target
    scores.

All static-shape: gt boxes arrive padded to a fixed M per image with a
validity mask (glottis data has M=1 real box).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from openglottal_tpu.models.yolo import REG_MAX, anchors_for

TAL_TOPK = 10
TAL_ALPHA = 0.5
TAL_BETA = 6.0
W_BOX, W_CLS, W_DFL = 7.5, 0.5, 1.5


def pairwise_ciou(gt, pred):
    """CIoU between gt (..., M, 1, 4) and pred (..., 1, A, 4) xyxy -> (..., M, A)."""
    gx1, gy1, gx2, gy2 = jnp.split(gt, 4, -1)
    px1, py1, px2, py2 = jnp.split(pred, 4, -1)
    ix1 = jnp.maximum(gx1, px1)
    iy1 = jnp.maximum(gy1, py1)
    ix2 = jnp.minimum(gx2, px2)
    iy2 = jnp.minimum(gy2, py2)
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    ag = jnp.clip(gx2 - gx1, 0) * jnp.clip(gy2 - gy1, 0)
    ap = jnp.clip(px2 - px1, 0) * jnp.clip(py2 - py1, 0)
    union = ag + ap - inter + 1e-7
    iou = inter / union
    # enclosing box diagonal
    cx1 = jnp.minimum(gx1, px1)
    cy1 = jnp.minimum(gy1, py1)
    cx2 = jnp.maximum(gx2, px2)
    cy2 = jnp.maximum(gy2, py2)
    c2 = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2 + 1e-7
    # centre distance
    rho2 = ((gx1 + gx2 - px1 - px2) ** 2 + (gy1 + gy2 - py1 - py2) ** 2) / 4.0
    # aspect-ratio term
    gw, gh = gx2 - gx1, jnp.clip(gy2 - gy1, 1e-7)
    pw, ph = px2 - px1, jnp.clip(py2 - py1, 1e-7)
    v = (4 / jnp.pi ** 2) * (jnp.arctan(gw / gh) - jnp.arctan(pw / ph)) ** 2
    alpha = v / (1.0 - iou + v + 1e-7)
    ciou = iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v
    return ciou[..., 0], iou[..., 0]


def _decode_pred(level_outputs, size_h: int, size_w: int):
    """Flatten head outputs: boxes (B,A,4) xyxy px, dist logits (B,A,4,R),
    cls logits (B,A,nc), anchors (A,2), strides (A,)."""
    boxes, dists, clss = [], [], []
    from openglottal_tpu.models.yolo import STRIDES

    for (b, c), s in zip(level_outputs, STRIDES):
        n, h, w, _ = b.shape
        d = b.reshape(n, h * w, 4, REG_MAX)
        dists.append(d)
        e = jax.nn.softmax(d, -1) @ jnp.arange(REG_MAX, dtype=jnp.float32)
        boxes.append(e)
        clss.append(c.reshape(n, h * w, -1))
    pts, strides = anchors_for(size_h, size_w)
    dist = jnp.concatenate(boxes, 1)
    x1y1 = pts[None] - dist[..., :2] * strides[None, :, None]
    x2y2 = pts[None] + dist[..., 2:] * strides[None, :, None]
    return (jnp.concatenate([x1y1, x2y2], -1),
            jnp.concatenate(dists, 1),
            jnp.concatenate(clss, 1), pts, strides)


def yolo_loss(level_outputs, gt_boxes, gt_valid, size_h: int = 256,
              size_w: int = 256):
    """gt_boxes: (B, M, 4) xyxy pixels; gt_valid: (B, M) bool.

    Returns (total, dict of parts).
    """
    pred_boxes, dist_logits, cls_logits, pts, strides = _decode_pred(
        level_outputs, size_h, size_w)
    b, a = cls_logits.shape[:2]
    m = gt_boxes.shape[1]
    cls_prob = jax.nn.sigmoid(cls_logits)[..., 0]  # (B, A) single class

    # candidate anchors: centre inside gt box (B, M, A)
    gx1, gy1, gx2, gy2 = [gt_boxes[..., i][:, :, None] for i in range(4)]
    px = pts[None, None, :, 0]
    py = pts[None, None, :, 1]
    inside = (px > gx1) & (px < gx2) & (py > gy1) & (py < gy2)
    inside = inside & gt_valid[:, :, None]

    ciou, iou = pairwise_ciou(gt_boxes[:, :, None, :],
                              jax.lax.stop_gradient(pred_boxes)[:, None, :, :])
    align = (jax.lax.stop_gradient(cls_prob)[:, None, :] ** TAL_ALPHA) * \
        (jnp.clip(iou, 0) ** TAL_BETA)
    align = jnp.where(inside, align, 0.0)

    # per-gt top-k mask
    topv, topi = jax.lax.top_k(align, TAL_TOPK)  # (B, M, K)
    topk_mask = jnp.zeros_like(align, bool)
    topk_mask = topk_mask.at[
        jnp.arange(b)[:, None, None],
        jnp.arange(m)[None, :, None],
        topi,
    ].set(topv > 0)

    # resolve anchors claimed by several gts: keep the gt with max align
    claimed = jnp.where(topk_mask, align, -1.0)
    best_gt = jnp.argmax(claimed, axis=1)              # (B, A)
    assigned = jnp.take_along_axis(topk_mask, best_gt[:, None, :], 1)[:, 0]  # (B,A)
    assigned = assigned & (jnp.max(claimed, 1) > 0)

    gather = lambda arr: jnp.take_along_axis(
        arr, best_gt[:, None, :], 1)[:, 0]             # (B, M, A) -> (B, A)

    # soft cls target: per-gt normalise so peak == best IoU (v8 semantics)
    max_align = jnp.max(jnp.where(topk_mask, align, 0), axis=2, keepdims=True)
    max_iou = jnp.max(jnp.where(topk_mask, jnp.clip(iou, 0), 0), 2, keepdims=True)
    norm = gather(align * max_iou / (max_align + 1e-9))
    t_score = jnp.where(assigned, norm, 0.0)           # (B, A)

    # ── cls: BCE over ALL anchors against soft targets ────────────────────
    bce = optax_sigmoid_bce(cls_logits[..., 0], t_score)
    denom = jnp.maximum(t_score.sum(), 1.0)
    loss_cls = bce.sum() / denom

    # ── box: CIoU on assigned anchors ─────────────────────────────────────
    ciou_a, _ = pairwise_ciou(
        gather_boxes(gt_boxes, best_gt)[:, :, None, :],
        pred_boxes[:, :, None, :])
    # gather_boxes -> (B, A, 4); pairwise over singleton M axis
    ciou_assigned = ciou_a[..., 0]
    loss_box = (jnp.where(assigned, (1.0 - ciou_assigned) * t_score, 0.0)
                ).sum() / denom

    # ── DFL on assigned anchors ───────────────────────────────────────────
    tb = gather_boxes(gt_boxes, best_gt)               # (B, A, 4) target xyxy
    lt = jnp.stack([pts[None, :, 0] - tb[..., 0], pts[None, :, 1] - tb[..., 1]], -1)
    rb = jnp.stack([tb[..., 2] - pts[None, :, 0], tb[..., 3] - pts[None, :, 1]], -1)
    target_d = jnp.concatenate([lt, rb], -1) / strides[None, :, None]
    target_d = jnp.clip(target_d, 0, REG_MAX - 1 - 0.01)
    tl = jnp.floor(target_d)
    wr = target_d - tl
    logp = jax.nn.log_softmax(dist_logits, -1)         # (B, A, 4, R)
    tl_i = tl.astype(jnp.int32)
    lp_l = jnp.take_along_axis(logp, tl_i[..., None], -1)[..., 0]
    lp_r = jnp.take_along_axis(logp, (tl_i + 1)[..., None], -1)[..., 0]
    dfl = -(lp_l * (1 - wr) + lp_r * wr).mean(-1)      # (B, A)
    loss_dfl = (jnp.where(assigned, dfl * t_score, 0.0)).sum() / denom

    total = W_BOX * loss_box + W_CLS * loss_cls + W_DFL * loss_dfl
    return total, {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl,
                   "assigned": assigned.sum()}


def gather_boxes(gt_boxes, best_gt):
    """(B, M, 4), (B, A) -> (B, A, 4)."""
    return jnp.take_along_axis(gt_boxes, best_gt[..., None], 1)


def optax_sigmoid_bce(logits, targets):
    import optax

    return optax.sigmoid_binary_cross_entropy(logits, targets)
