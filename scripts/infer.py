"""Batch annotated-video inference (reference scripts/infer.py).

AVI-dir or image-dir modes; all five pipelines; overlay styles fill / contour
/ none (semi-transparent green fill + contour, yellow bbox, area text —
reference :91-124); MJPG ``<stem>_out.avi`` writers; one features.csv row per
input with f0 scaled by --capture-fps (GIRAFE records at 4000 fps, :87).

TPU re-architecture: masks/boxes/areas come from one batched pipeline pass
(pipelines.run_pipeline_full); only the overlay drawing and video encode stay
host-side (cv2) — they are I/O, not compute.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}
FEATURE_COLS = ["area_mean", "area_std", "area_range",
                "open_quotient", "f0", "periodicity", "cv"]
GIRAFE_CAPTURE_FPS = 4000.0


def draw_overlay(frame_bgr, mask, box, area, overlay_style="fill"):
    """Reference overlay (infer.py:91-124): green fill+contour, yellow bbox."""
    import cv2

    out = frame_bgr.copy()
    if mask is not None and mask.any() and overlay_style != "none":
        m8 = (mask > 0).astype(np.uint8) * 255
        cs, _ = cv2.findContours(m8, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if overlay_style == "fill":
            green = np.zeros_like(out)
            green[:, :, 1] = m8
            out = cv2.addWeighted(out, 1.0, green, 0.4, 0)
        cv2.drawContours(out, cs, -1, (0, 255, 0), 1)
    if box is not None:
        x1, y1, x2, y2 = (int(v) for v in box)
        cv2.rectangle(out, (x1, y1), (x2, y2), (0, 220, 255), 1)
    cv2.putText(out, f"area={int(area)}", (4, 14), cv2.FONT_HERSHEY_SIMPLEX,
                0.4, (255, 255, 255), 1, cv2.LINE_AA)
    return out


def write_avi(path, frames, fps=25.0):
    import cv2

    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    for f in frames:
        vw.write(f)
    vw.release()


def load_images(input_dir: Path):
    import cv2

    frames = []
    for f in sorted(input_dir.iterdir()):
        if f.suffix.lower() in IMAGE_EXTS and not f.name.endswith("_seg.png"):
            img = cv2.imread(str(f))
            if img is not None:
                frames.append(img)
    return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("input_dir")
    p.add_argument("--mode", choices=["avi", "images"], default="avi")
    p.add_argument("--pipeline",
                   choices=["vft", "guided-vft", "unet", "unet-only", "crop-unet"],
                   default="unet")
    p.add_argument("--unet-weights", default=None)
    p.add_argument("--yolo-weights", default=None)
    p.add_argument("--crop-weights", default=None)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--overlay-style", choices=["fill", "contour", "none"],
                   default="fill")
    p.add_argument("--capture-fps", type=float, default=GIRAFE_CAPTURE_FPS)
    p.add_argument("--fps", type=float, default=None, help="Output fps (images mode).")
    p.add_argument("--output-dir", "-o", default="results/infer")
    args = p.parse_args()

    import cv2

    from openglottal_tpu.data.video import load_frames_bgr
    from openglottal_tpu.features import kinematic_features
    from openglottal_tpu.pipelines import GlottalPipelines
    from openglottal_tpu.utils.io import load_unet_weights, load_yolo_weights

    pipe = GlottalPipelines(
        unet_variables=load_unet_weights(args.unet_weights) if args.unet_weights else None,
        crop_unet_variables=load_unet_weights(args.crop_weights) if args.crop_weights else None,
        yolo_variables=load_yolo_weights(args.yolo_weights) if args.yolo_weights else None,
        conf=args.conf,
    )

    input_dir = Path(args.input_dir)
    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    jobs = []
    if args.mode == "avi":
        avis = sorted(input_dir.glob("*.avi")) or sorted(input_dir.rglob("*.avi"))
        if not avis:
            print(f"No .avi files found in {input_dir}", file=sys.stderr)
            sys.exit(1)
        for avi in avis:
            cap = cv2.VideoCapture(str(avi))
            fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
            cap.release()
            jobs.append((avi.stem, load_frames_bgr(avi), fps))
    else:
        jobs.append((input_dir.name, load_images(input_dir), args.fps or 25.0))

    csv_path = output_dir / "features.csv"
    with open(csv_path, "w", newline="") as csv_file:
        writer = csv.DictWriter(csv_file, fieldnames=["source"] + FEATURE_COLS)
        writer.writeheader()

        for stem, frames, fps in jobs:
            print(f"\n[{stem}]  {len(frames)} frames @ {fps:.1f} fps", flush=True)
            if len(frames) == 0:
                print("  WARNING: no frames loaded, skipping.")
                continue

            masks, valids, boxes, areas = pipe.run_pipeline_full(frames, args.pipeline)
            masks = np.asarray(masks) if masks is not None else None
            valids = np.asarray(valids) if valids is not None else None
            boxes = np.asarray(boxes) if boxes is not None else None
            areas = np.asarray(areas)

            annotated = []
            for i, frm in enumerate(frames):
                m = masks[i] if masks is not None else None
                b = (boxes[i] if (boxes is not None and valids is not None
                                  and valids[i]) else None)
                annotated.append(draw_overlay(frm, m, b, areas[i],
                                              args.overlay_style))
            out_avi = output_dir / f"{stem}_out.avi"
            write_avi(out_avi, annotated, fps)
            print(f"  Wrote {out_avi}")

            feats = kinematic_features(areas)
            if feats is None:
                print("  WARNING: silent waveform — no glottis detected.")
                writer.writerow({"source": stem, **{c: "" for c in FEATURE_COLS}})
                continue
            if feats["f0"] is not None:
                feats["f0"] = feats["f0"] * args.capture_fps  # cycles/frame -> Hz
            row = {"source": stem}
            for col in FEATURE_COLS:
                v = feats[col]
                row[col] = f"{v:.4f}" if isinstance(v, float) else v
                print(f"  {col}: {v:.4f}" if isinstance(v, float) else f"  {col}: {v}")
            writer.writerow(row)

    print(f"\nFeatures saved to {csv_path}")


if __name__ == "__main__":
    main()
