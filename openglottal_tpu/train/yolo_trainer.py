"""YOLOv8n detector training (owning what the reference delegated to
ultralytics, scripts/train_yolo.py:107-121).

Data: images + one gt box per image derived from the segmentation mask with
the reference's 10-px dilation (openglottal/data.py:28-68).  Augmentation
reproduces the ultralytics v8 DEFAULTS the reference trains with — mosaic4 +
RandomPerspective(translate 0.1, scale 0.5) + HSV(0.015/0.7/0.4) + fliplr,
with the close_mosaic=10 switch-off schedule — batched on device
(train/yolo_aug.py; the paper pins "default YOLOv8 augmentation",
main.tex:319).  The close-mosaic phase (and ``mosaic=False``) runs the
single-image affine+photometric ``augment_det_batch``.

Optimizer: AdamW + cosine (same family as the U-Net recipe; ultralytics
auto-selects AdamW for small datasets too).
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from openglottal_tpu.models.yolo import YOLOv8
from openglottal_tpu.train.yolo_loss import yolo_loss


class YoloTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def boxes_from_masks(masks: np.ndarray, dilate: int = 10) -> np.ndarray:
    """Tight mask bbox + dilate px each side (reference mask_to_yolo,
    data.py:59-63).  Returns (N, 4) xyxy pixels; -1 rows for empty masks."""
    n, h, w = masks.shape
    out = np.full((n, 4), -1.0, np.float32)
    for i in range(n):
        ys, xs = np.nonzero(masks[i])
        if len(ys):
            out[i] = [max(0, xs.min() - dilate), max(0, ys.min() - dilate),
                      min(w, xs.max() + dilate), min(h, ys.max() + dilate)]
    return out


@jax.jit
def augment_det_batch(key, imgs, boxes, valid):
    """Detection augmentation: flip-lr/ud, scale+translate affine (box-aware),
    brightness/contrast jitter.  imgs: (B, S, S, 3) float [0,1];
    boxes: (B, 4) xyxy px."""
    b, s = imgs.shape[0], imgs.shape[1]
    ks = jax.random.split(key, 8)
    hflip = jax.random.uniform(ks[0], (b,)) > 0.5
    vflip = jax.random.uniform(ks[1], (b,)) > 0.5
    scale = jax.random.uniform(ks[2], (b,), minval=0.6, maxval=1.4)
    tx = jax.random.uniform(ks[3], (b,), minval=-0.1, maxval=0.1) * s
    ty = jax.random.uniform(ks[4], (b,), minval=-0.1, maxval=0.1) * s
    bright = jax.random.uniform(ks[5], (b,), minval=0.7, maxval=1.3)

    c = (s - 1) / 2.0
    yy, xx = jnp.mgrid[0:s, 0:s].astype(jnp.float32)

    def geo(img, bx, hf, vf, sc, dx, dy):
        # inverse map: src = c + (dst - c - t)/s, then flip
        sx = (xx - c - dx) / sc + c
        sy = (yy - c - dy) / sc + c
        sx = jnp.where(hf, (s - 1) - sx, sx)
        sy = jnp.where(vf, (s - 1) - sy, sy)
        x0 = jnp.clip(jnp.floor(sx), 0, s - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(sy), 0, s - 1).astype(jnp.int32)
        x1 = jnp.clip(x0 + 1, 0, s - 1)
        y1 = jnp.clip(y0 + 1, 0, s - 1)
        wx = jnp.clip(sx - x0, 0, 1)[..., None]
        wy = jnp.clip(sy - y0, 0, 1)[..., None]
        inb = ((sx >= 0) & (sx <= s - 1) & (sy >= 0) & (sy <= s - 1))[..., None]
        v = ((1 - wy) * (1 - wx) * img[y0, x0] + (1 - wy) * wx * img[y0, x1]
             + wy * (1 - wx) * img[y1, x0] + wy * wx * img[y1, x1])
        v = jnp.where(inb, v, 0.0)
        # forward-map the box: dst = c + t + s*(src - c), flips mirror coords
        fx1 = jnp.where(hf, (s - 1) - bx[2], bx[0])
        fx2 = jnp.where(hf, (s - 1) - bx[0], bx[2])
        fy1 = jnp.where(vf, (s - 1) - bx[3], bx[1])
        fy2 = jnp.where(vf, (s - 1) - bx[1], bx[3])
        nb = jnp.stack([
            jnp.clip(c + dx + sc * (fx1 - c), 0, s),
            jnp.clip(c + dy + sc * (fy1 - c), 0, s),
            jnp.clip(c + dx + sc * (fx2 - c), 0, s),
            jnp.clip(c + dy + sc * (fy2 - c), 0, s),
        ])
        return v, nb

    imgs, boxes = jax.vmap(geo)(imgs, boxes, hflip, vflip, scale, tx, ty)
    imgs = jnp.clip(imgs * bright[:, None, None, None], 0, 1)
    # degenerate (clipped-away) boxes become invalid
    valid = valid & ((boxes[:, 2] - boxes[:, 0]) > 2) & ((boxes[:, 3] - boxes[:, 1]) > 2)
    return imgs, boxes, valid


@partial(jax.jit, static_argnames=("model", "tx", "mosaic"))
def yolo_train_step(model: YOLOv8, tx, state: YoloTrainState, imgs_u8,
                    boxes, valid, key, mosaic: bool = False):
    """One AdamW step.  ``mosaic=False``: imgs (B, S, S, 3), one gt per
    image (close-mosaic phase: single-image affine+photometric,
    augment_det_batch).  ``mosaic=True``: imgs (B, 4, S, S, 3) — each
    sample plus 3 dataset-uniform partners — through the ultralytics-default
    mosaic4 + affine + HSV + flip (train/yolo_aug.py), up to 4 gt boxes per
    image into the multi-gt TAL loss."""
    if mosaic:
        from openglottal_tpu.train.yolo_aug import mosaic_affine_hsv

        x, bx, vd = mosaic_affine_hsv(key, imgs_u8, boxes, valid)
    else:
        x = imgs_u8.astype(jnp.float32) / 255.0
        x, bx1, vd1 = augment_det_batch(key, x, boxes, valid)
        bx, vd = bx1[:, None, :], vd1[:, None]

    def loss_fn(params):
        outs, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        total, parts = yolo_loss(outs, bx, vd, x.shape[1], x.shape[2])
        return total, (updates["batch_stats"], parts)

    (l, (bs, parts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, batch_stats=bs,
                         opt_state=opt_state, step=state.step + 1), l, parts


class YoloTrainer:
    def __init__(self, nc: int = 1, lr: float = 1e-3, weight_decay: float = 0.01,
                 batch_size: int = 16, dtype=jnp.bfloat16, seed: int = 0):
        self.model = YOLOv8(nc=nc, dtype=dtype)
        self.lr0 = lr
        self.batch_size = batch_size
        self.rng = jax.random.PRNGKey(seed)
        self.tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay)

    def init_state(self, resume_params=None) -> YoloTrainState:
        k, self.rng = jax.random.split(self.rng)
        variables = self.model.init(k, jnp.zeros((1, 256, 256, 3)), train=False)
        params = resume_params if resume_params is not None else variables["params"]
        return YoloTrainState(params=params, batch_stats=variables["batch_stats"],
                              opt_state=self.tx.init(params), step=jnp.asarray(0))

    def set_lr(self, state, lr):
        # pure rebuild — mutating opt_state.hyperparams in place would alias
        # every YoloTrainState sharing the dict (see unet_trainer.set_lr)
        opt_state = state.opt_state._replace(hyperparams={
            **state.opt_state.hyperparams,
            "learning_rate": jnp.asarray(lr, jnp.float32),
        })
        return state.replace(opt_state=opt_state)

    def fit(self, imgs_rgb_u8, boxes, val_imgs=None, val_boxes=None,
            epochs: int = 100, patience: int | None = None, ckpt_dir=None,
            verbose=True, state: YoloTrainState | None = None,
            mosaic: bool = True, close_mosaic: int = 10):
        """imgs_rgb_u8: (N, 256, 256, 3) uint8 RGB; boxes: (N, 4) xyxy px
        (-1 rows = no object).  Returns ``(state, best, history)`` where
        ``best`` is the variables dict of the best epoch — highest
        ``recall/val`` when a val set is given (lowest train loss otherwise)
        — mirroring the U-Net trainer's best/latest/patience contract
        (reference train_unet.py:204-213; ultralytics' best.pt tracks the
        val fitness metric the same way).  ``patience`` stops after that
        many epochs without improvement.

        ``mosaic``/``close_mosaic`` follow ultralytics defaults: mosaic4 on
        every epoch except the final ``close_mosaic`` ones (with the paper's
        2-epoch recipe the switch-off never fires — epochs - close_mosaic
        < 0 — exactly like ultralytics; paper/main.tex:319)."""
        import math

        if state is None:
            state = self.init_state()
        n = len(imgs_rgb_u8)
        bs = self.batch_size
        imgs = jnp.asarray(imgs_rgb_u8)
        bx = jnp.asarray(np.where(boxes[:, :1] >= 0, boxes, 0).astype(np.float32))
        vd = jnp.asarray(boxes[:, 0] >= 0)
        order_rng = np.random.default_rng(42)  # seed 42 like the reference splits
        history = []
        warmup = min(3, max(1, epochs // 10))  # ultralytics-style lr warmup
        mosaic_off_at = epochs - close_mosaic  # ultralytics trainer semantics
        best_metric = -float("inf")
        best = None
        bad_epochs = 0
        for epoch in range(epochs):
            lr = self.lr0 * (1 + math.cos(math.pi * epoch / epochs)) / 2
            if epoch < warmup:
                lr = self.lr0 * (epoch + 1) / (warmup + 1)
            state = self.set_lr(state, lr)
            use_mosaic = mosaic and not (0 <= mosaic_off_at <= epoch)
            perm = order_rng.permutation(n)
            losses = []
            t0 = time.time()
            # natural-size tail batch: torch DataLoader drop_last=False
            # semantics (one extra jit specialization for the tail shape)
            for i in range(0, n, bs):
                idx = perm[i:i + bs]
                k, self.rng = jax.random.split(self.rng)
                if use_mosaic:
                    # 3 dataset-uniform partners per sample (ultralytics
                    # samples partner indices uniformly from the dataset)
                    partners = order_rng.integers(0, n, (len(idx), 3))
                    quad = jnp.asarray(
                        np.concatenate([idx[:, None], partners], axis=1))
                    state, l, parts = yolo_train_step(
                        self.model, self.tx, state, imgs[quad], bx[quad],
                        vd[quad], k, mosaic=True)
                else:
                    j = jnp.asarray(idx)
                    state, l, parts = yolo_train_step(
                        self.model, self.tx, state, imgs[j], bx[j], vd[j], k)
                losses.append((l, len(idx)))
            rec = {"epoch": epoch + 1,
                   "loss/train": (float(sum(float(l) * t for l, t in losses)
                                        / sum(t for _, t in losses))
                                  if losses else None),
                   "lr": lr, "sec": round(time.time() - t0, 2)}
            if val_imgs is not None:
                rec["recall/val"] = self.eval_recall(state, val_imgs, val_boxes)
            history.append(rec)
            if verbose:
                print(json.dumps(rec), flush=True)
            if ckpt_dir is not None:
                self.save(ckpt_dir, state, "latest")
                (Path(ckpt_dir) / "metrics.jsonl").open("a").write(json.dumps(rec) + "\n")
            # improvement metric: recall/val when available, else -train loss
            # (no val set: the reference's unified recipe falls back the same
            # way in the U-Net trainer)
            metric = (rec["recall/val"] if val_imgs is not None
                      else -(rec["loss/train"]
                             if rec["loss/train"] is not None else math.inf))
            if metric > best_metric:
                best_metric = metric
                best = jax.device_get(
                    {"params": state.params, "batch_stats": state.batch_stats})
                bad_epochs = 0
                if ckpt_dir is not None:
                    self.save(ckpt_dir, state, "best")
            else:
                bad_epochs += 1
                if patience is not None and bad_epochs >= patience:
                    if verbose:
                        print(f"early stop at epoch {epoch + 1} "
                              f"(no val improvement for {patience})", flush=True)
                    break
        return state, best, history

    def eval_recall(self, state, imgs_rgb_u8, boxes, conf: float = 0.25,
                    iou_thresh: float = 0.5, batch: int = 64) -> float:
        """Fraction of gt boxes recovered by the max-conf detection at
        IoU >= iou_thresh (detection-gate usage pattern)."""
        from openglottal_tpu.models.yolo import max_conf_detect

        @partial(jax.jit, static_argnames=("conf_",))
        def detect(variables, chunk_u8, conf_):
            x = chunk_u8.astype(jnp.float32) / 255.0
            outs = self.model.apply(variables, x, train=False)
            return max_conf_detect(outs, x.shape[1], x.shape[2], conf_)

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        hits = 0
        total = 0
        n = len(imgs_rgb_u8)
        for i in range(0, n, batch):
            chunk = imgs_rgb_u8[i:i + batch]
            if len(chunk) < batch:  # pad to one static shape
                chunk = jnp.concatenate(
                    [jnp.asarray(chunk),
                     jnp.zeros((batch - len(chunk),) + chunk.shape[1:],
                               chunk.dtype)])
            has, box, _ = detect(variables, jnp.asarray(chunk), conf)
            has, box = np.asarray(has), np.asarray(box)
            for j in range(min(batch, n - i)):
                g = boxes[i + j]
                if g[0] < 0:
                    continue
                total += 1
                if not has[j]:
                    continue
                ix1, iy1 = max(g[0], box[j][0]), max(g[1], box[j][1])
                ix2, iy2 = min(g[2], box[j][2]), min(g[3], box[j][3])
                inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
                ag = (g[2] - g[0]) * (g[3] - g[1])
                ap = max(0, box[j][2] - box[j][0]) * max(0, box[j][3] - box[j][1])
                if inter / (ag + ap - inter + 1e-9) >= iou_thresh:
                    hits += 1
        return hits / max(total, 1)

    def save(self, ckpt_dir, state, name):
        import orbax.checkpoint as ocp

        path = Path(ckpt_dir).resolve() / name
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(
            {"params": state.params, "batch_stats": state.batch_stats,
             "step": int(state.step)}), force=True)
        ckptr.wait_until_finished()

    @staticmethod
    def load_variables(ckpt_dir, name: str = "best"):
        import orbax.checkpoint as ocp

        path = Path(ckpt_dir).resolve() / name
        tree = ocp.StandardCheckpointer().restore(path)
        return {"params": tree["params"], "batch_stats": tree["batch_stats"]}
