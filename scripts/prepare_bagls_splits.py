"""Build BAGLS training.json (reference scripts/prepare_bagls_splits.py):
N.png + N_seg.png pairing, seed-42 shuffle, validation split."""

from __future__ import annotations

import argparse
import json
import random
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data-dir", required=True,
                   help="Directory with N.png and N_seg.png pairs.")
    p.add_argument("--output", default="bagls_training.json")
    p.add_argument("--val-frac", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-images", type=int, default=0)
    args = p.parse_args()

    d = Path(args.data_dir)
    fnames = sorted(
        f.name for f in d.iterdir()
        if f.suffix == ".png" and not f.name.endswith("_seg.png")
        and (d / f"{f.stem}_seg.png").exists()
    )
    if args.max_images:
        fnames = fnames[: args.max_images]
    rng = random.Random(args.seed)
    rng.shuffle(fnames)
    n_val = int(len(fnames) * args.val_frac)
    splits = {"training": sorted(fnames[n_val:]), "Val": sorted(fnames[:n_val])}
    with open(args.output, "w") as f:
        json.dump(splits, f, indent=2)
    print(f"{args.output}: train {len(splits['training'])} / val {len(splits['Val'])}")


if __name__ == "__main__":
    main()
