"""BAGLS test-set evaluation (TPU-batched).

Reference protocol (scripts/eval_bagls.py in /root/reference): N.png /
N_seg.png pairs, image and GT letterboxed identically to 256², detector
RESET PER FRAME (BAGLS test frames are not a temporal sequence, :160-166),
three pipelines (unet-only / yolo+unet / yolo-crop+unet with a separate
--crop-weights model, :298-299), detection TP/FP/FN = GT-pixels-inside-
predicted-box bookkeeping (:173-191), optional --crop-pad box expansion,
JSON output with timestamp suffix (:369-391).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

PIPELINES = ["unet-only", "yolo+unet", "yolo-crop+unet"]
LABELS = {"unet-only": "U-Net only", "yolo+unet": "YOLO+UNet",
          "yolo-crop+unet": "YOLO-Crop+UNet"}


def load_letterboxed(test_dir: Path, max_images: int = 0, canvas: int = 256):
    """Load and letterbox image+GT pairs exactly like the reference
    (image INTER_LINEAR 3-ch, GT INTER_NEAREST 2-D, both to canvas²)."""
    import cv2

    from openglottal_tpu.ops.resize import letterbox_info

    img_files = sorted(f for f in test_dir.iterdir()
                       if f.suffix == ".png" and not f.name.endswith("_seg.png"))
    if max_images:
        img_files = img_files[:max_images]
    frames, gts = [], []
    for img_path in img_files:
        seg_path = img_path.with_name(img_path.stem + "_seg.png")
        if not seg_path.exists():
            continue
        img = cv2.imread(str(img_path))
        gt = cv2.imread(str(seg_path), cv2.IMREAD_GRAYSCALE)
        if img is None or gt is None:
            continue
        h, w = img.shape[:2]
        if (h, w) != (canvas, canvas):
            pt, pl, ch, cw = letterbox_info(h, w, canvas)
            ib = np.zeros((canvas, canvas, 3), np.uint8)
            ib[pt:pt + ch, pl:pl + cw] = cv2.resize(img, (cw, ch),
                                                    interpolation=cv2.INTER_LINEAR)
            gb = np.zeros((canvas, canvas), np.uint8)
            gb[pt:pt + ch, pl:pl + cw] = cv2.resize(gt, (cw, ch),
                                                    interpolation=cv2.INTER_NEAREST)
            img, gt = ib, gb
        frames.append(img)
        gts.append(gt > 0)
    return np.stack(frames), np.stack(gts)


def detection_stats(valid, boxes, gts) -> dict:
    """TP/FP/FN via GT-pixels-inside-predicted-box (reference :173-191)."""
    stats = {"tp": 0, "fp": 0, "fn": 0, "n_pos_gt": 0}
    for v, b, g in zip(valid, boxes, gts):
        gt_pos = bool(g.any())
        if gt_pos:
            stats["n_pos_gt"] += 1
        if v:
            x1, y1, x2, y2 = (int(max(0, min(g.shape[1], b[0]))),
                              int(max(0, min(g.shape[0], b[1]))),
                              int(max(0, min(g.shape[1], b[2]))),
                              int(max(0, min(g.shape[0], b[3]))))
            if g[y1:y2, x1:x2].any():
                stats["tp"] += 1
            else:
                stats["fp"] += 1
        elif gt_pos:
            stats["fn"] += 1
    return stats


def main() -> None:
    p = argparse.ArgumentParser(
        description="BAGLS test evaluation (TPU-batched).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--test-dir", required=True)
    p.add_argument("--unet-weights", required=True)
    p.add_argument("--yolo-weights", default=None)
    p.add_argument("--crop-weights", default=None)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--crop-pad", type=int, default=0)
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--output-json", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from openglottal_tpu.data.video import bgr_to_gray_u8
    from openglottal_tpu.eval import box_masked, frame_metrics_batch
    from openglottal_tpu.pipelines import GlottalPipelines
    from openglottal_tpu.utils.io import load_unet_weights, load_yolo_weights

    pipe = GlottalPipelines(
        unet_variables=load_unet_weights(args.unet_weights),
        crop_unet_variables=(load_unet_weights(args.crop_weights)
                             if args.crop_weights else None),
        yolo_variables=(load_yolo_weights(args.yolo_weights)
                        if args.yolo_weights else None),
        conf=args.conf,
    )

    from openglottal_tpu.pipelines import to_device

    frames, gts = load_letterboxed(Path(args.test_dir), args.max_images)
    print(f"Evaluating {len(frames)} letterboxed frames")
    frames_dev = to_device(frames)
    gray = bgr_to_gray_u8(frames_dev)
    gt_j = to_device(gts)

    agg = {}
    masks_u = pipe.segment_video(gray)
    d, i = frame_metrics_batch(masks_u, gt_j)
    agg["unet-only"] = {"dice": np.asarray(d), "iou": np.asarray(i), "det": None}

    det_stats = None
    if args.yolo_weights:
        valid, boxes = pipe.gated_boxes(frames_dev, sequential=False)
        det = np.asarray(valid)
        det_stats = detection_stats(det, np.asarray(boxes), gts)
        d, i = frame_metrics_batch(box_masked(masks_u, valid, boxes), gt_j)
        agg["yolo+unet"] = {"dice": np.asarray(d), "iou": np.asarray(i), "det": det}
        if args.crop_weights:
            b = boxes
            if args.crop_pad:
                b = jnp.stack([
                    jnp.clip(boxes[:, 0] - args.crop_pad, 0, 256),
                    jnp.clip(boxes[:, 1] - args.crop_pad, 0, 256),
                    jnp.clip(boxes[:, 2] + args.crop_pad, 0, 256),
                    jnp.clip(boxes[:, 3] + args.crop_pad, 0, 256)], -1)
            cm, _, _ = pipe.crop_unet_masks(frames_dev, gray_u8=gray,
                                            valid=valid, boxes=b)
            d, i = frame_metrics_batch(cm, gt_j)
            agg["yolo-crop+unet"] = {"dice": np.asarray(d), "iou": np.asarray(i),
                                     "det": det}

    sep = "─" * 72
    print(f"\n{sep}")
    print(f"  {'Method':<20}  {'Det.Recall':>10}  {'Dice':>8}  {'IoU':>8}  {'Dice≥0.5':>10}")
    print(sep)
    for pname, r in agg.items():
        dr = "1.000" if r["det"] is None else f"{r['det'].mean():.3f}"
        dice50 = np.mean(r["dice"] >= 0.5) * 100
        print(f"  {LABELS[pname]:<20}  {dr:>10}  {r['dice'].mean():>8.3f}  "
              f"{r['iou'].mean():>8.3f}  {dice50:>9.1f}%")
    print(sep)
    if det_stats:
        tp, fp, fn = det_stats["tp"], det_stats["fp"], det_stats["fn"]
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        print(f"  Detector: precision {prec:.3f}  recall {rec:.3f}  "
              f"(TP {tp}, FP {fp}, FN {fn})")

    if args.output_json:
        stamp = time.strftime("%Y%m%d_%H%M%S")
        out_path = Path(args.output_json)
        out_path = out_path.with_name(f"{out_path.stem}_{stamp}{out_path.suffix}")
        payload = {
            pname: {"dice": r["dice"].tolist(), "iou": r["iou"].tolist(),
                    "det": (r["det"].tolist() if r["det"] is not None else None)}
            for pname, r in agg.items()
        }
        if det_stats:
            payload["det_stats"] = det_stats
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(payload, f)
        print(f"Saved {out_path}")


if __name__ == "__main__":
    main()
