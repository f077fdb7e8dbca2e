"""Build synthetic GIRAFE + BAGLS trees shaped EXACTLY like the Zenodo
extracts, so every parity command in PARITY_PLAYBOOK.md can be rehearsed
end-to-end in this zero-egress environment and re-run verbatim the day the
real datasets are reachable.

Layouts reproduced (reference README.md:296-302 and
scripts/download_datasets.py):

  GIRAFE/Training/imagesTr/patient<ID>_<NNN>.png   256² grayscale-ish frames
  GIRAFE/Training/labelsTr/patient<ID>_<NNN>.png   0/255 binary masks
  GIRAFE/Raw_Data/patient<ID>/patient<ID>.avi      MJPG high-speed video
  GIRAFE/Raw_Data/patient<ID>/metadata.json        {"disorder status": ...}
  BAGLS/training/<N>.png + <N>_seg.png             mixed sizes (letterboxed)
  BAGLS/test/<N>.png + <N>_seg.png

The four fixed GIRAFE test patients (57A3, 61, 63, 64 —
prepare_girafe_splits.py) are always generated so the published-protocol
split applies unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

TEST_IDS = ["57A3", "61", "63", "64"]
DISORDERS = ["Healthy", "Paresis", "Polyps", "Healthy", "Paralysis",
             "Nodules", "Healthy", "Cysts"]
# non-square BAGLS-like source sizes to exercise the letterbox path
BAGLS_SIZES = [(256, 256), (200, 320), (160, 256), (288, 224)]


def write_patient(gir: Path, pid: str, idx: int, frames_per: int, t_video: int,
                  realistic: bool) -> None:
    import cv2

    from openglottal_tpu.data.synthetic import synthetic_video

    rng = np.random.default_rng(1000 + idx)
    cy, cx = rng.uniform(80, 176, 2)
    frames, masks = synthetic_video(t=t_video, size=256, center=(cy, cx),
                                    seed=1000 + idx, drift_px=0.5,
                                    realistic=realistic)
    img_dir = gir / "Training" / "imagesTr"
    lbl_dir = gir / "Training" / "labelsTr"
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    # evenly sampled annotated frames, like GIRAFE's sparse expert labels
    for k, fi in enumerate(np.linspace(0, t_video - 1, frames_per).astype(int)):
        cv2.imwrite(str(img_dir / f"patient{pid}_{k:03d}.png"), frames[fi])
        cv2.imwrite(str(lbl_dir / f"patient{pid}_{k:03d}.png"),
                    masks[fi].astype(np.uint8) * 255)

    pdir = gir / "Raw_Data" / f"patient{pid}"
    pdir.mkdir(parents=True, exist_ok=True)
    vw = cv2.VideoWriter(str(pdir / f"patient{pid}.avi"),
                         cv2.VideoWriter_fourcc(*"MJPG"), 30, (256, 256))
    for f in frames:
        vw.write(f)
    vw.release()
    meta = {"disorder status": DISORDERS[idx % len(DISORDERS)],
            "sex": "F" if idx % 2 else "M"}
    with open(pdir / "metadata.json", "w") as fh:
        json.dump(meta, fh)


def write_bagls(split_dir: Path, n: int, seed0: int, realistic: bool) -> None:
    import cv2

    from openglottal_tpu.data.synthetic import synthetic_video

    split_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        h, w = BAGLS_SIZES[i % len(BAGLS_SIZES)]
        s = max(h, w)
        rng = np.random.default_rng(seed0 + i)
        cy, cx = rng.uniform(0.3 * s, 0.7 * s, 2)
        frames, masks = synthetic_video(t=3, size=s, center=(cy, cx),
                                        seed=seed0 + i, realistic=realistic)
        # crop the square render to the target aspect (BAGLS images vary)
        img = frames[2][:h, :w]
        msk = masks[2][:h, :w]
        cv2.imwrite(str(split_dir / f"{i}.png"), img)
        cv2.imwrite(str(split_dir / f"{i}_seg.png"), msk.astype(np.uint8) * 255)


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--output-dir", default="outputs/zenodo_synth")
    p.add_argument("--girafe-train-patients", type=int, default=4,
                   help="Training patients in addition to the 4 fixed test patients.")
    p.add_argument("--frames-per-patient", type=int, default=20)
    p.add_argument("--video-frames", type=int, default=80)
    p.add_argument("--bagls-train", type=int, default=48)
    p.add_argument("--bagls-test", type=int, default=24)
    p.add_argument("--realistic", action="store_true", default=True)
    p.add_argument("--simple", dest="realistic", action="store_false")
    args = p.parse_args()

    root = Path(args.output_dir)
    gir = root / "GIRAFE"
    pids = [f"{i + 1:02d}" for i in range(args.girafe_train_patients)] + TEST_IDS
    for idx, pid in enumerate(pids):
        write_patient(gir, pid, idx, args.frames_per_patient,
                      args.video_frames, args.realistic)
        print(f"  GIRAFE patient{pid}", flush=True)
    write_bagls(root / "BAGLS" / "training", args.bagls_train, 5000,
                args.realistic)
    write_bagls(root / "BAGLS" / "test", args.bagls_test, 7000, args.realistic)
    n_img = len(list((gir / "Training" / "imagesTr").iterdir()))
    print(f"{root}: GIRAFE {len(pids)} patients / {n_img} annotated frames; "
          f"BAGLS train {args.bagls_train} / test {args.bagls_test}")


if __name__ == "__main__":
    main()
