"""Single-pass YOLO confidence-threshold sweep on BAGLS (reference
scripts/sweep_bagls_conf.py): run detection ONCE at conf=0.001, cache the
per-frame (best box, conf, full-frame U-Net mask, crop U-Net mask), then
re-threshold at each τ post-hoc (:34-36, :199-240).  Like the reference, the
raw per-frame max-conf detection bypasses the TemporalDetector's centre
clamp (:92-110) — which is exactly our stateless detector output.

Per-frame Dice at a chosen τ can be exported for the paper waveform figure
(:293-307).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

TAUS = [0.001, 0.005, 0.01, 0.02, 0.03, 0.05, 0.10, 0.25]


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--test-dir", required=True)
    p.add_argument("--unet-weights", required=True)
    p.add_argument("--crop-weights", required=True)
    p.add_argument("--yolo-weights", required=True)
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--export-dice-tau", type=float, default=0.02)
    p.add_argument("--output-json", default="results/bagls_sweep.json")
    args = p.parse_args()

    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from eval_bagls import load_letterboxed

    from openglottal_tpu.data.video import bgr_to_gray_u8
    from openglottal_tpu.eval import box_masked, frame_metrics_batch
    from openglottal_tpu.models.gate import gate_single
    from openglottal_tpu.pipelines import GlottalPipelines, to_device
    from openglottal_tpu.utils.io import load_unet_weights, load_yolo_weights

    pipe = GlottalPipelines(
        unet_variables=load_unet_weights(args.unet_weights),
        crop_unet_variables=load_unet_weights(args.crop_weights),
        yolo_variables=load_yolo_weights(args.yolo_weights),
        conf=0.001,
    )

    frames, gts = load_letterboxed(Path(args.test_dir), args.max_images)
    print(f"Sweeping τ over {len(frames)} frames")
    fdev = to_device(frames)
    gray = bgr_to_gray_u8(fdev)
    gt_j = to_device(gts)

    # ── single pass: raw detections + masks cached ─────────────────────────
    has, raw_boxes, confs = pipe.detect_video(fdev)
    masks_full = pipe.segment_video(gray)
    # gate per frame at τ=0 (pure geometry: padding + clamp, no temporal state)
    valid_all, boxes_all = gate_single(has, raw_boxes, 256, 256,
                                       params=pipe.gate_params)
    crop_masks, _, _ = pipe.crop_unet_masks(fdev, gray_u8=gray,
                                            valid=valid_all, boxes=boxes_all)
    confs = np.asarray(confs)
    gt_any = gts.reshape(len(gts), -1).any(1)

    rows = []
    export = None
    for tau in TAUS:
        det = np.asarray(has) & (confs > tau)
        det_j = to_device(det)
        d_full, i_full = frame_metrics_batch(
            box_masked(masks_full, det_j, boxes_all), gt_j)
        d_crop, i_crop = frame_metrics_batch(
            crop_masks & det_j[:, None, None], gt_j)
        d_crop, i_crop = np.asarray(d_crop), np.asarray(i_crop)
        d_full, i_full = np.asarray(d_full), np.asarray(i_full)
        recall = float(det[gt_any].mean()) if gt_any.any() else float("nan")
        rows.append({
            "tau": tau, "det_recall": recall,
            "full": {"dice": float(d_full.mean()), "iou": float(i_full.mean()),
                     "dice50": float((d_full >= 0.5).mean() * 100)},
            "crop": {"dice": float(d_crop.mean()), "iou": float(i_crop.mean()),
                     "dice50": float((d_crop >= 0.5).mean() * 100)},
        })
        print(f"  τ={tau:<6} recall={recall:.3f}  "
              f"crop dice={rows[-1]['crop']['dice']:.3f} "
              f"iou={rows[-1]['crop']['iou']:.3f} "
              f"d50={rows[-1]['crop']['dice50']:.1f}%", flush=True)
        if abs(tau - args.export_dice_tau) < 1e-9:
            export = d_crop.tolist()

    out = {"sweep": rows}
    if export is not None:
        out[f"per_frame_dice_tau_{args.export_dice_tau}"] = export
    Path(args.output_json).parent.mkdir(parents=True, exist_ok=True)
    with open(args.output_json, "w") as f:
        json.dump(out, f)
    print(f"Saved {args.output_json}")


if __name__ == "__main__":
    main()
