"""Paper-figure montage: evenly sampled frames of an annotated AVI arranged
in a bordered grid (reference scripts/make_montage.py:35-76)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("video", help="Annotated AVI (e.g. from scripts/infer.py).")
    p.add_argument("--rows", type=int, default=2)
    p.add_argument("--cols", type=int, default=5)
    p.add_argument("--border", type=int, default=2)
    p.add_argument("--output", default="montage.png")
    args = p.parse_args()

    import cv2

    from openglottal_tpu.data.video import load_frames_bgr

    frames = load_frames_bgr(args.video)
    n = args.rows * args.cols
    if len(frames) < n:
        print(f"video has only {len(frames)} frames; need {n}", file=sys.stderr)
        sys.exit(1)
    idx = np.linspace(0, len(frames) - 1, n).astype(int)
    b = args.border
    h, w = frames.shape[1:3]
    grid = np.full((args.rows * (h + b) + b, args.cols * (w + b) + b, 3),
                   255, np.uint8)
    for k, i in enumerate(idx):
        r, c = divmod(k, args.cols)
        y = b + r * (h + b)
        x = b + c * (w + b)
        grid[y:y + h, x:x + w] = frames[i]
    cv2.imwrite(args.output, grid)
    print(f"Saved {args.output} ({args.rows}x{args.cols} montage)")


if __name__ == "__main__":
    main()
