"""One GAW plot PNG per patient (reference scripts/plot_gaw.py): area
waveform + feature annotation box; --resume skips existing outputs."""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--raw-data-dir", required=True)
    p.add_argument("--unet-weights", required=True)
    p.add_argument("--yolo-weights", required=True)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--capture-fps", type=float, default=4000.0)
    p.add_argument("--output-dir", default="results/gaw_plots")
    p.add_argument("--resume", action="store_true",
                   help="Skip patients whose plot already exists.")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from openglottal_tpu.data.video import load_frames_bgr
    from openglottal_tpu.features import kinematic_features
    from openglottal_tpu.pipelines import GlottalPipelines
    from openglottal_tpu.utils.io import load_unet_weights, load_yolo_weights

    pipe = GlottalPipelines(
        unet_variables=load_unet_weights(args.unet_weights),
        yolo_variables=load_yolo_weights(args.yolo_weights),
        conf=args.conf,
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for pdir in sorted(Path(args.raw_data_dir).iterdir()):
        if not pdir.is_dir():
            continue
        out_png = out_dir / f"{pdir.name}.png"
        if args.resume and out_png.exists():
            continue
        avis = sorted(pdir.glob("*.avi"))
        if not avis:
            continue
        frames = load_frames_bgr(avis[0])
        if len(frames) == 0:
            continue
        areas = np.asarray(pipe.yolo_unet_areas(frames))
        feats = kinematic_features(areas)

        fig, ax = plt.subplots(figsize=(10, 4))
        ax.plot(areas, lw=0.8)
        ax.set_xlabel("frame")
        ax.set_ylabel("glottal area (px)")
        ax.set_title(pdir.name)
        if feats is not None:
            f0 = feats["f0"] * args.capture_fps if feats["f0"] is not None else None
            text = "\n".join([
                f"area_mean={feats['area_mean']:.1f}",
                f"open_quotient={feats['open_quotient']:.3f}",
                f"f0={f0:.1f} Hz" if f0 is not None else "f0=n/a",
                f"periodicity={feats['periodicity']:.3f}",
                f"cv={feats['cv']:.3f}",
            ])
            ax.text(0.99, 0.97, text, transform=ax.transAxes, va="top",
                    ha="right", fontsize=8,
                    bbox=dict(boxstyle="round", fc="white", alpha=0.8))
        fig.tight_layout()
        fig.savefig(out_png, dpi=120)
        plt.close(fig)
        print(f"  {out_png}", flush=True)


if __name__ == "__main__":
    main()
