"""Paper figure: 3-panel GAW example composition (reference
scripts/fig_gaw_examples.py): stacks existing per-patient GAW plot PNGs
(default patients 14 Healthy / 50 Paresis / 46B1 Paralysis, :19-23)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

DEFAULT_PATIENTS = ["patient14", "patient50", "patient46B1"]  # reference :19-23


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--plots-dir", default="results/gaw_plots",
                   help="Directory of per-patient PNGs from plot_gaw.py.")
    p.add_argument("--patients", nargs="+", default=DEFAULT_PATIENTS)
    p.add_argument("--output", default="fig_gaw_examples.png")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    import matplotlib.pyplot as plt

    plots = []
    for name in args.patients:
        path = Path(args.plots_dir) / f"{name}.png"
        if not path.exists():
            print(f"missing {path} — run scripts/plot_gaw.py first", file=sys.stderr)
            sys.exit(1)
        plots.append(mpimg.imread(path))

    fig, axes = plt.subplots(len(plots), 1, figsize=(10, 3.2 * len(plots)))
    if len(plots) == 1:
        axes = [axes]
    for ax, img, name in zip(axes, plots, args.patients):
        ax.imshow(img)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main()
