"""Segmentation metrics with the reference's conventions.

Reference: openglottal/utils.py:191-213 — dice/iou binarize with >0 and return
1.0 when both masks are empty; dice_loss is the soft-Dice on sigmoid(logits).
All jnp, jittable and batchable (metrics reduce over the trailing axes,
preserving any leading batch axes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice(pred, gt):
    """Dice coefficient; empty ∧ empty = 1.0 (utils.py:191-197)."""
    p = (pred > 0).astype(jnp.float32)
    g = (gt > 0).astype(jnp.float32)
    axes = tuple(range(p.ndim - 2, p.ndim))
    inter = (p * g).sum(axes)
    denom = p.sum(axes) + g.sum(axes)
    return jnp.where(denom > 0, 2.0 * inter / jnp.maximum(denom, 1.0), 1.0)


def iou(pred, gt):
    """Intersection-over-union; empty ∧ empty = 1.0 (utils.py:200-206)."""
    p = (pred > 0).astype(jnp.float32)
    g = (gt > 0).astype(jnp.float32)
    axes = tuple(range(p.ndim - 2, p.ndim))
    inter = (p * g).sum(axes)
    union = p.sum(axes) + g.sum(axes) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)


def dice_loss(logits, target, eps: float = 1e-6):
    """Differentiable soft-Dice loss over the whole batch (utils.py:209-213)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = target.astype(jnp.float32)
    inter = (p * t).sum()
    return 1.0 - (2.0 * inter + eps) / (p.sum() + t.sum() + eps)
