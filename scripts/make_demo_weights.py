"""Train the in-repo demo weights (weights/demo_unet.npz, demo_yolo.npz).

The reference ships trained .pt weights (stripped from the mirror —
.MISSING_LARGE_BLOBS); real GIRAFE/BAGLS are unreachable in this zero-egress
environment, so the checked-in equivalents here are trained on the REALISTIC
synthetic endoscopy domain (data/synthetic.py: vignette, specular highlights,
fold texture) with this framework's own trainers — the same recipe as the
selftest integration gate (scripts/selftest_e2e.py), more epochs.

Purpose: a working out-of-the-box demo (cli run / infer / analyze_gaw find
weights via resolve_weights_path) and a REALISTIC benchmark: with a trained
detector, gate boxes are glottis-sized, which drives the trackers' windowed
fast path and content-dependent fixpoint convergence the way production
would (bench.py loads these when present).

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/make_demo_weights.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs-unet", type=int, default=8)
    p.add_argument("--epochs-yolo", type=int, default=24)
    p.add_argument("--output-dir", default=str(ROOT / "weights"))
    args = p.parse_args()

    from selftest_e2e import make_dataset

    from openglottal_tpu.data.video import bgr_to_gray_u8
    from openglottal_tpu.eval import aggregate, evaluate_patient
    from openglottal_tpu.pipelines import GlottalPipelines
    from openglottal_tpu.train.unet_trainer import UNetTrainer
    from openglottal_tpu.train.yolo_trainer import YoloTrainer
    from openglottal_tpu.utils.io import save_weights_npz

    t0 = time.time()
    tr_f, tr_m, tr_b = make_dataset(12, 24, seed0=100, realistic=True)
    va_f, va_m, va_b = make_dataset(2, 16, seed0=900, realistic=True)
    te_f, te_m, _ = make_dataset(2, 40, seed0=990, realistic=True)
    gray_tr = np.asarray(bgr_to_gray_u8(tr_f))
    gray_va = np.asarray(bgr_to_gray_u8(va_f))
    print(f"dataset: {len(tr_f)}/{len(va_f)}/{len(te_f)} frames "
          f"({time.time()-t0:.0f}s)", flush=True)

    ut = UNetTrainer(batch_size=16, lr=1e-3)
    ustate, _, _ = ut.fit(gray_tr, tr_m.astype(np.uint8), gray_va,
                          va_m.astype(np.uint8), epochs=args.epochs_unet,
                          verbose=True)
    uvars = {"params": ustate.params, "batch_stats": ustate.batch_stats}

    yt = YoloTrainer(batch_size=16, lr=2e-3)
    # mosaic off: tiny synthetic set, same rationale as selftest_e2e.py
    ystate, _, yhist = yt.fit(tr_f[..., ::-1], tr_b, va_f[..., ::-1], va_b,
                           epochs=args.epochs_yolo, mosaic=False, verbose=True)
    yvars = {"params": ystate.params, "batch_stats": ystate.batch_stats}

    out = Path(args.output_dir)
    save_weights_npz(uvars, out / "demo_unet.npz")
    save_weights_npz(yvars, out / "demo_yolo.npz")
    for f in ("demo_unet.npz", "demo_yolo.npz"):
        print(f"wrote {out/f} ({(out/f).stat().st_size/1e6:.1f} MB)")

    # quick gate: eval Dice + recall, and the gate's box-size profile on a
    # fresh test video (drives the trackers' 128²-window fast path)
    pipe = GlottalPipelines(unet_variables=uvars, crop_unet_variables=uvars,
                            yolo_variables=yvars, conf=0.25)
    per = {f"synth{k}": evaluate_patient(
        pipe, te_f[k * 40:(k + 1) * 40], te_m[k * 40:(k + 1) * 40],
        sequential=True) for k in range(2)}
    agg = aggregate(per)
    gray_te = np.asarray(bgr_to_gray_u8(te_f[:40]))
    import jax
    valid, boxes = pipe._gated(None, jax.device_put(gray_te))
    b = np.asarray(boxes)
    ws, hs = b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]
    print({k: round(v["dice"], 3) for k, v in agg.items() if "dice" in v})
    print(f"recall {agg.get('yolo+unet', {}).get('det_recall')}, "
          f"box w max {ws.max()} h max {hs.max()} "
          f"(windowed tracker path needs <= 126)")
    print(f"done in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
