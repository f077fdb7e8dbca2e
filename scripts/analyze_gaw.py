"""Clinical GAW study over the GIRAFE Raw_Data cohort (reference
scripts/analyze_gaw.py): per-patient YOLO+UNet area waveform -> kinematic
features (f0 x 4000 fps), Healthy-vs-Pathological grouping from
patient*/metadata.json "disorder status", Mann-Whitney U per feature,
boxplot figure, gaw_features.json.

TPU: each patient's video is one fused batched pass (~0.1 s/patient instead
of the reference's ~15 s) — the 65-patient study runs in seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

FEATURES = ["area_mean", "area_std", "area_range", "open_quotient",
            "f0", "periodicity", "cv"]
CAPTURE_FPS = 4000.0  # GIRAFE HSV (reference analyze_gaw.py:98-99)
PATHOLOGICAL = {"Paresis", "Polyps", "Diplophonia", "Nodules", "Paralysis",
                "Cysts", "Carcinoma", "Multinodular Goiter", "Other"}


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--raw-data-dir", required=True,
                   help="GIRAFE Raw_Data directory (patient*/ with AVI + metadata.json).")
    p.add_argument("--unet-weights", required=True)
    p.add_argument("--yolo-weights", required=True)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--output-dir", default="results/gaw")
    p.add_argument("--boxplot", action="store_true", default=True)
    args = p.parse_args()

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
    records = []

    def patient_stream():
        """Decode patients lazily; per-patient fault tolerance lives HERE so
        one bad video can't kill the study (reference analyze_gaw semantics).
        Yields (name, status, frames) for readable videos only."""
        for pdir in sorted(Path(args.raw_data_dir).iterdir()):
            if not pdir.is_dir():
                continue
            meta_file = pdir / "metadata.json"
            status = "Unknown"
            if meta_file.exists():
                status = json.load(open(meta_file)).get("disorder status",
                                                        "Unknown")
            avis = sorted(pdir.glob("*.avi"))
            if not avis:
                continue
            try:
                frames = load_frames_bgr(avis[0])
            except Exception as e:  # noqa: BLE001
                print(f"  WARNING: {pdir.name}: failed "
                      f"({type(e).__name__}: {e})")
                continue
            if len(frames) == 0:
                print(f"  WARNING: {pdir.name}: unreadable video, skipping")
                continue
            yield pdir.name, status, frames

    def _put(job):
        """Background-thread transfer; exceptions become per-patient values
        so the prefetch stream keeps flowing."""
        name, status, frames = job
        try:
            return name, status, pipe.prepare(frames)
        except Exception as e:  # noqa: BLE001
            return name, status, e

    from openglottal_tpu.data.prefetch import prefetch_to_device

    def _finish(name, status, areas_dev):
        """Fetch one patient's dispatched waveform and record its features
        (the device->host readback is the only sync point per patient)."""
        try:
            feats = kinematic_features(np.asarray(areas_dev))
        except Exception as e:  # noqa: BLE001
            print(f"  WARNING: {name}: failed ({type(e).__name__}: {e})")
            return
        if feats is None:
            print(f"  WARNING: {name}: silent waveform")
            return
        if feats["f0"] is not None:
            feats["f0"] = feats["f0"] * CAPTURE_FPS
        rec = {"patient": name, "status": status,
               **{k: feats[k] for k in FEATURES}}
        records.append(rec)
        print(f"  {name:<16} {status:<12} "
              + " ".join(f"{k}={feats[k]:.3f}" if isinstance(feats[k], float)
                         else f"{k}=None" for k in FEATURES), flush=True)

    # software pipeline: decode+transfer of patient i+1 overlaps compute of
    # patient i (prefetch), and patient i's waveform is fetched only while
    # i+1's dispatch is in flight — the per-video dispatch+readback
    # round-trip (~40 ms through the TPU relay, results/PROFILE_r03.md)
    # overlaps compute instead of serializing the study
    pending = None
    for name, status, prep in prefetch_to_device(patient_stream(), size=2,
                                                 put=_put):
        try:
            if isinstance(prep, Exception):
                raise prep
            frames_dev, gray = prep
            areas_dev = (
                pipe.yolo_unet_areas_gray(gray) if frames_dev is None
                else pipe.yolo_unet_areas(frames_dev, gray_u8=gray))
        except Exception as e:  # noqa: BLE001
            print(f"  WARNING: {name}: failed ({type(e).__name__}: {e})")
            continue
        if pending is not None:
            _finish(*pending)
        pending = (name, status, areas_dev)
    if pending is not None:
        _finish(*pending)

    with open(out_dir / "gaw_features.json", "w") as f:
        json.dump(records, f, indent=2)
    print(f"\nSaved {len(records)} patient records to {out_dir/'gaw_features.json'}")

    # ── group comparison (host-side scipy; analyze_gaw.py:196-221) ────────
    healthy = [r for r in records if r["status"] == "Healthy"]
    patho = [r for r in records if r["status"] in PATHOLOGICAL]
    print(f"\nHealthy {len(healthy)} vs Pathological {len(patho)}")
    try:
        from scipy.stats import mannwhitneyu
    except ImportError:
        mannwhitneyu = None
    results = {}
    for feat in FEATURES:
        a = [r[feat] for r in healthy if r[feat] is not None]
        b = [r[feat] for r in patho if r[feat] is not None]
        if len(a) < 3 or len(b) < 3 or mannwhitneyu is None:
            continue
        stat, pval = mannwhitneyu(a, b, alternative="two-sided")
        results[feat] = {"healthy_mean": float(np.mean(a)),
                         "patho_mean": float(np.mean(b)), "p": float(pval)}
        sig = " *" if pval < 0.05 else ""
        print(f"  {feat:<15} H {np.mean(a):8.3f}±{np.std(a):6.3f}  "
              f"P {np.mean(b):8.3f}±{np.std(b):6.3f}  p={pval:.4f}{sig}")
    with open(out_dir / "gaw_stats.json", "w") as f:
        json.dump(results, f, indent=2)

    if args.boxplot and healthy and patho:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 4, figsize=(14, 7))
        for ax, feat in zip(axes.ravel(), FEATURES):
            a = [r[feat] for r in healthy if r[feat] is not None]
            b = [r[feat] for r in patho if r[feat] is not None]
            ax.boxplot([a, b], tick_labels=["Healthy", "Pathological"])
            ax.set_title(feat)
        axes.ravel()[-1].axis("off")
        fig.tight_layout()
        fig.savefig(out_dir / "gaw_boxplots.png", dpi=150)
        print(f"Saved {out_dir/'gaw_boxplots.png'}")


if __name__ == "__main__":
    main()
