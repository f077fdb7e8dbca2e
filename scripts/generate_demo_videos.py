"""Demo-video generation (reference scripts/generate_demo_videos.py):
runs infer.py twice — unet-only and YOLO+UNet — over a video directory."""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("input_dir")
    p.add_argument("--unet-weights", required=True)
    p.add_argument("--yolo-weights", required=True)
    p.add_argument("--output-dir", default="results/demos")
    args = p.parse_args()

    infer = Path(__file__).parent / "infer.py"
    for pipeline, sub in [("unet-only", "unet_only"), ("unet", "yolo_unet")]:
        cmd = [sys.executable, str(infer), args.input_dir,
               "--pipeline", pipeline,
               "--unet-weights", args.unet_weights,
               "--output-dir", f"{args.output_dir}/{sub}"]
        if pipeline != "unet-only":
            cmd += ["--yolo-weights", args.yolo_weights]
        print("$", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
