"""Paper figure: BAGLS τ-sweep plot (reference scripts/fig_bagls_sweep.py).

The reference hardcodes its Table-5 sweep arrays (:31-35); here the figure is
drawn from a sweep JSON produced by scripts/sweep_bagls_conf.py (falling back
to the reference's published values so the figure is reproducible without
data), plus optional per-frame Dice panels.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Published sweep (reference fig_bagls_sweep.py:31-35 / paper Table 5)
PUB_TAU = [0.001, 0.005, 0.01, 0.02, 0.03, 0.05, 0.10, 0.25]
PUB_RECALL = [0.943, 0.917, 0.895, 0.859, 0.842, 0.819, 0.773, 0.688]
PUB_DSC = [0.646, 0.652, 0.654, 0.659, 0.656, 0.652, 0.641, 0.609]
PUB_IOU = [0.553, 0.561, 0.563, 0.568, 0.567, 0.565, 0.558, 0.533]
PUB_D50 = [75.0, 75.7, 75.8, 76.3, 76.0, 75.6, 74.3, 70.3]


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--sweep-json", default=None,
                   help="Output of sweep_bagls_conf.py; default: published values.")
    p.add_argument("--output", default="fig_bagls_sweep.png")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.sweep_json:
        data = json.load(open(args.sweep_json))["sweep"]
        tau = [r["tau"] for r in data]
        rec = [r["det_recall"] for r in data]
        dsc = [r["crop"]["dice"] for r in data]
        iou = [r["crop"]["iou"] for r in data]
        d50 = [r["crop"]["dice50"] for r in data]
        label = "measured"
    else:
        tau, rec, dsc, iou, d50 = PUB_TAU, PUB_RECALL, PUB_DSC, PUB_IOU, PUB_D50
        label = "published (reference Table 5)"

    fig, ax1 = plt.subplots(figsize=(7, 4.2))
    ax1.plot(tau, dsc, "o-", label="DSC")
    ax1.plot(tau, iou, "s-", label="IoU")
    ax1.plot(tau, [v / 100 for v in d50], "^-", label="DSC≥0.5")
    ax1.set_xscale("log")
    ax1.set_xlabel("YOLO confidence threshold τ")
    ax1.set_ylabel("segmentation metric")
    ax2 = ax1.twinx()
    ax2.plot(tau, rec, "d--", color="gray", label="Det.Recall")
    ax2.set_ylabel("detection recall")
    ax1.legend(loc="lower left")
    ax2.legend(loc="lower right")
    ax1.set_title(f"BAGLS zero-shot τ sweep ({label})")
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main()
