"""Per-patient evaluation on the GIRAFE test split (TPU-batched).

Reproduces the reference's Table-3 report format (scripts/eval_girafe.py in
/root/reference): published baselines side-by-side with our five pipelines,
per-frame Dice/IoU/Dice>=0.5, Det.Recall, per-pathology Dice, JSON export.
Unlike the reference this accepts a separate --crop-weights (the reference
asks users to pass crop weights as --unet-weights, eval_girafe.py:373 — the
eval_bagls approach is unified here per SURVEY.md §7).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

GIRAFE_BASELINE = [
    ("InP (GIRAFE paper)", None, 0.713, None, None),
    ("U-Net (GIRAFE paper)", None, 0.643, None, None),
    ("SwinUNetV2 (paper)", None, 0.621, None, None),
]
TEST_PATIENTS = ["patient57A3", "patient61", "patient63", "patient64"]
LABELS = {
    "unet-only": "U-Net only", "yolo+otsu": "YOLO+OTSU", "yolo+unet": "YOLO+UNet",
    "yolo-crop+unet": "YOLO-Crop+UNet *", "yolo+motion": "YOLO+Motion",
}


def load_patient_to_pathology(raw_data_dir: Path) -> dict:
    out = {}
    for pdir in sorted(raw_data_dir.iterdir()):
        meta_file = pdir / "metadata.json"
        if pdir.is_dir() and meta_file.exists():
            out[pdir.name] = json.load(open(meta_file)).get("disorder status", "Unknown")
    return out


def print_table(agg: dict, has_yolo: bool) -> None:
    sep = "─" * 76
    print(f"\n{sep}")
    print(f"  {'Method':<25}  {'Det.Recall':>10}  {'Dice':>8}  {'IoU':>8}  {'Dice≥0.5':>10}")
    print(sep)
    for label, det_rec, dice, iou, d50 in GIRAFE_BASELINE:
        dr = f"{det_rec:.3f}" if det_rec is not None else "  n/a  "
        d = f"{dice:.3f}" if dice is not None else "  n/a  "
        io = f"{iou:.3f}" if iou is not None else "  n/a  "
        d5 = f"{d50:.1f}%" if d50 is not None else "  n/a  "
        print(f"  {label:<25}  {dr:>10}  {d:>8}  {io:>8}  {d5:>10}")
    print("  " + "· " * 37)
    for pipe, row in agg.items():
        dr = "1.000 *" if pipe == "unet-only" else (
            f"{row['det_recall']:.3f}" if row["det_recall"] is not None else "n/a")
        print(f"  {LABELS[pipe]:<25}  {dr:>10}  {row['dice']:>8.3f}  "
              f"{row['iou']:>8.3f}  {row['dice50']:>9.1f}%")
    print(sep)
    print("  * U-Net only: no YOLO gate — always processes 100% of frames.")


def main() -> None:
    p = argparse.ArgumentParser(
        description="GIRAFE test evaluation (TPU-batched): Det.Recall, Dice, IoU, Dice≥0.5.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--images-dir", required=True)
    p.add_argument("--labels-dir", required=True)
    p.add_argument("--training-json", required=True)
    p.add_argument("--raw-data-dir", default=None)
    p.add_argument("--unet-weights", required=True)
    p.add_argument("--yolo-weights", default=None)
    p.add_argument("--crop-weights", default=None,
                   help="Crop-trained U-Net for yolo-crop+unet (falls back to "
                        "--unet-weights like the reference).")
    p.add_argument("--max-hold-frames", type=int, default=3)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--output-json", default=None)
    args = p.parse_args()

    import cv2

    from openglottal_tpu.eval import aggregate, evaluate_patient
    from openglottal_tpu.models.gate import GateParams
    from openglottal_tpu.pipelines import GlottalPipelines
    from openglottal_tpu.utils.io import load_unet_weights, load_yolo_weights

    pipe = GlottalPipelines(
        unet_variables=load_unet_weights(args.unet_weights),
        crop_unet_variables=load_unet_weights(args.crop_weights or args.unet_weights),
        yolo_variables=load_yolo_weights(args.yolo_weights) if args.yolo_weights else None,
        conf=args.conf,
        gate_params=GateParams(30.0, 8, args.max_hold_frames),
    )

    splits = json.load(open(args.training_json))
    test_fnames = splits["test"]
    print(f"Test frames   : {len(test_fnames)} across {len(TEST_PATIENTS)} patients\n")

    by_patient = defaultdict(list)
    for fname in sorted(test_fnames):
        by_patient["_".join(fname.split("_")[:-1])].append(fname)

    per_patient = {}
    for patient, fnames in by_patient.items():
        print(f"  Processing {patient} ({len(fnames)} frames)...", flush=True)
        frames, gts = [], []
        for fname in fnames:
            img = cv2.imread(str(Path(args.images_dir) / fname))
            gt = cv2.imread(str(Path(args.labels_dir) / fname), cv2.IMREAD_GRAYSCALE)
            if img is None or gt is None:
                print(f"    WARNING: could not read {fname}, skipping.")
                continue
            frames.append(img)
            gts.append(gt > 0)
        per_patient[patient] = evaluate_patient(
            pipe, np.stack(frames), np.stack(gts), sequential=True)

    agg = aggregate(per_patient)
    print_table(agg, has_yolo=args.yolo_weights is not None)

    if args.raw_data_dir and Path(args.raw_data_dir).is_dir():
        patho_of = load_patient_to_pathology(Path(args.raw_data_dir))
        by_patho = defaultdict(lambda: defaultdict(list))
        for patient, res in per_patient.items():
            for pname, r in res.items():
                by_patho[patho_of.get(patient, "Unknown")][pname].extend(
                    r["dice"].tolist())
        print("\nDice by pathology (mean over frames):")
        pipes = list(LABELS)
        print("  " + "".join(f"{LABELS[q]:>16}" for q in pipes))
        for patho in sorted(by_patho):
            row = [f"{np.mean(by_patho[patho][q]):.3f}" if by_patho[patho].get(q)
                   else "  n/a  " for q in pipes]
            print(f"  {patho:<12}" + "".join(f"{r:>16}" for r in row))

    if args.output_json:
        out = {"aggregate": {k: {kk: vv for kk, vv in v.items()
                                 if kk not in ("dices", "ious")}
                             for k, v in agg.items()},
               "per_frame_dice": {k: v["dices"] for k, v in agg.items()}}
        Path(args.output_json).parent.mkdir(parents=True, exist_ok=True)
        with open(args.output_json, "w") as f:
            json.dump(out, f, indent=2)
        print(f"Raw results saved to {args.output_json}")


if __name__ == "__main__":
    main()
