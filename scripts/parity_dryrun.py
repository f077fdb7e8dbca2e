"""CI-style rehearsal of every real-data parity command (PARITY_PLAYBOOK.md).

Builds a synthetic directory tree shaped exactly like the GIRAFE/BAGLS Zenodo
extracts (make_synthetic_zenodo.py), then runs the EXACT command per published
table — split prep, U-Net / crop U-Net / YOLO training, GIRAFE eval, BAGLS
zero-shot + in-distribution eval, the τ sweep, the GAW clinical study, and
annotated inference — end to end via subprocess, asserting each exits 0 and
leaves its expected artifact.  The day the real datasets are reachable, the
parity run is these same commands with the data root swapped
(VERDICT.md round-1 item 10).

Usage:  python scripts/parity_dryrun.py [--root outputs/parity_dryrun] [--fast]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
REPO = Path(__file__).resolve().parents[1]
SCRIPTS = REPO / "scripts"


def run(title: str, cmd: list[str], cwd: Path) -> None:
    print(f"\n── {title}\n   $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run([sys.executable] + cmd, cwd=cwd)
    if r.returncode != 0:
        print(f"PARITY DRYRUN FAIL at: {title}")
        sys.exit(1)
    print(f"   ok ({time.time() - t0:.0f}s)", flush=True)


def expect(path: Path) -> None:
    if not path.exists():
        print(f"PARITY DRYRUN FAIL: expected artifact missing: {path}")
        sys.exit(1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="outputs/parity_dryrun")
    p.add_argument("--fast", action="store_true",
                   help="Tiny dataset + 1-epoch trainings (plumbing check only).")
    args = p.parse_args()

    root = Path(args.root).resolve()
    root.mkdir(parents=True, exist_ok=True)
    gir = root / "GIRAFE"
    bagls = root / "BAGLS"
    t_start = time.time()

    epochs_unet = "1" if args.fast else "4"
    epochs_yolo = "2" if args.fast else "12"
    data_flags = (["--girafe-train-patients", "2", "--frames-per-patient", "8",
                   "--video-frames", "24", "--bagls-train", "8",
                   "--bagls-test", "8"] if args.fast else [])

    run("synthetic Zenodo tree",
        [str(SCRIPTS / "make_synthetic_zenodo.py"), "--output-dir", str(root)]
        + data_flags, cwd=root)

    # ── split preparation (README.md:299-300 protocol) ────────────────────
    run("GIRAFE splits",
        [str(SCRIPTS / "prepare_girafe_splits.py"),
         "--images-dir", str(gir / "Training" / "imagesTr"),
         "--output", str(gir / "Training" / "training.json")], cwd=root)
    run("BAGLS splits",
        [str(SCRIPTS / "prepare_bagls_splits.py"),
         "--data-dir", str(bagls / "training"),
         "--output", str(bagls / "bagls_training.json")], cwd=root)

    img = str(gir / "Training" / "imagesTr")
    lbl = str(gir / "Training" / "labelsTr")
    tj = str(gir / "Training" / "training.json")

    # ── training (README.md:202-240 commands) ─────────────────────────────
    run("train U-Net (GIRAFE)",
        [str(SCRIPTS / "train_unet.py"), "--images-dir", img,
         "--labels-dir", lbl, "--training-json", tj,
         "--epochs", epochs_unet, "--output-dir", str(root / "out/unet")],
        cwd=root)
    unet_w = root / "out/unet/best"
    expect(unet_w)

    run("train YOLO (GIRAFE)",
        [str(SCRIPTS / "train_yolo.py"), "--images-dir", img,
         "--labels-dir", lbl, "--training-json", tj,
         "--epochs", epochs_yolo, "--output-dir", str(root / "out/yolo")],
        cwd=root)
    yolo_w = root / "out/yolo/best"
    expect(yolo_w)

    run("train crop U-Net (GT mode)",
        [str(SCRIPTS / "train_unet_crop.py"), "--images-dir", img,
         "--labels-dir", lbl, "--training-json", tj, "--mode", "gt",
         "--epochs", epochs_unet, "--output-dir", str(root / "out/unet_crop"),
         "--cache-dir", str(root / "out/cache")], cwd=root)
    crop_w = root / "out/unet_crop/best"
    expect(crop_w)

    # ── Table: GIRAFE test split (paper/main.tex:566-575) ─────────────────
    run("eval GIRAFE",
        [str(SCRIPTS / "eval_girafe.py"), "--images-dir", img,
         "--labels-dir", lbl, "--training-json", tj,
         "--raw-data-dir", str(gir / "Raw_Data"),
         "--unet-weights", str(unet_w), "--yolo-weights", str(yolo_w),
         "--crop-weights", str(crop_w),
         "--output-json", str(root / "results/girafe_eval.json")], cwd=root)
    expect(root / "results/girafe_eval.json")

    # ── Table: BAGLS zero-shot with GIRAFE weights (main.tex:667-671) ─────
    run("eval BAGLS zero-shot",
        [str(SCRIPTS / "eval_bagls.py"), "--test-dir", str(bagls / "test"),
         "--unet-weights", str(unet_w), "--yolo-weights", str(yolo_w),
         "--crop-weights", str(crop_w),
         "--output-json", str(root / "results/bagls_zeroshot.json")], cwd=root)

    # ── Table: BAGLS in-distribution (main.tex:709-711): retrain on BAGLS ─
    run("train U-Net (BAGLS, label_suffix=_seg)",
        [str(SCRIPTS / "train_unet.py"), "--images-dir", str(bagls / "training"),
         "--labels-dir", str(bagls / "training"),
         "--training-json", str(bagls / "bagls_training.json"),
         "--label-suffix", "_seg", "--epochs", epochs_unet,
         "--output-dir", str(root / "out/unet_bagls")], cwd=root)
    unet_b = root / "out/unet_bagls/best"
    expect(unet_b)
    run("eval BAGLS in-distribution",
        [str(SCRIPTS / "eval_bagls.py"), "--test-dir", str(bagls / "test"),
         "--unet-weights", str(unet_b), "--yolo-weights", str(yolo_w),
         "--crop-weights", str(crop_w),
         "--output-json", str(root / "results/bagls_indist.json")], cwd=root)

    # ── Table: τ sweep (fig_bagls_sweep data, main.tex:671) ───────────────
    run("BAGLS τ sweep",
        [str(SCRIPTS / "sweep_bagls_conf.py"), "--test-dir", str(bagls / "test"),
         "--unet-weights", str(unet_w), "--crop-weights", str(crop_w),
         "--yolo-weights", str(yolo_w),
         "--output-json", str(root / "results/bagls_sweep.json")], cwd=root)
    expect(root / "results/bagls_sweep.json")

    # ── Table: GAW clinical study (main.tex:778-852) ──────────────────────
    run("GAW study",
        [str(SCRIPTS / "analyze_gaw.py"), "--raw-data-dir", str(gir / "Raw_Data"),
         "--unet-weights", str(unet_w), "--yolo-weights", str(yolo_w),
         "--output-dir", str(root / "results/gaw")], cwd=root)
    expect(root / "results/gaw/gaw_features.json")
    run("GAW plots",
        [str(SCRIPTS / "plot_gaw.py"), "--raw-data-dir", str(gir / "Raw_Data"),
         "--unet-weights", str(unet_w), "--yolo-weights", str(yolo_w),
         "--output-dir", str(root / "results/gaw_plots"), "--resume"], cwd=root)

    # ── annotated inference over the Raw_Data AVIs (README demo path) ─────
    run("infer (annotated videos)",
        [str(SCRIPTS / "infer.py"),
         str(gir / "Raw_Data" / "patient57A3"), "--pipeline", "crop-unet",
         "--unet-weights", str(unet_w), "--yolo-weights", str(yolo_w),
         "--crop-weights", str(crop_w),
         "--output-dir", str(root / "results/infer")], cwd=root)

    agg = json.load(open(root / "results/girafe_eval.json"))["aggregate"]
    print(f"\nPARITY DRYRUN PASS ({time.time() - t_start:.0f}s; GIRAFE "
          f"pipelines scored: {sorted(agg)}). Commands above are the "
          f"real-data parity run with the data root swapped.")


if __name__ == "__main__":
    main()
