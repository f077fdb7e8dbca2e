"""Crop-mode U-Net training (reference scripts/train_unet_crop.py).

Materialises a crop dataset (GT-bbox mode with +8 px pad, or YOLO-ROI mode
skipping no-detection frames), letterboxes crops to 256², caches to disk
(sha256-keyed, :54-70; ``--cache-only`` exits after materialisation), then
runs the same training recipe as full-frame (0.5·BCE + 0.5·dice, AdamW +
cosine, best/_latest checkpoints, patience).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--images-dir", required=True)
    p.add_argument("--labels-dir", required=True)
    p.add_argument("--training-json", required=True)
    p.add_argument("--label-suffix", default="")
    p.add_argument("--mode", choices=["gt", "yolo"], default="gt")
    p.add_argument("--yolo-weights", default=None,
                   help="Required for --mode yolo.")
    p.add_argument("--crop-pad", type=int, default=8)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--cache-dir", default="outputs/cache")
    p.add_argument("--cache-only", action="store_true")
    p.add_argument("--output-dir", default="outputs/unet_crop")
    args = p.parse_args()

    from openglottal_tpu.data.crop_dataset import (
        materialize_gt_crops,
        materialize_yolo_crops,
    )
    from openglottal_tpu.data.dataset import load_split_json
    from openglottal_tpu.train.unet_trainer import UNetTrainer

    splits = load_split_json(args.training_json)

    def build(fnames):
        if args.mode == "gt":
            return materialize_gt_crops(fnames, args.images_dir, args.labels_dir,
                                        pad=args.crop_pad,
                                        label_suffix=args.label_suffix,
                                        cache_dir=args.cache_dir)
        if not args.yolo_weights:
            p.error("--yolo-weights is required for --mode yolo")
        from openglottal_tpu.pipelines import GlottalPipelines
        from openglottal_tpu.utils.io import load_yolo_weights

        pipe = GlottalPipelines(yolo_variables=load_yolo_weights(args.yolo_weights),
                                conf=args.conf)
        return materialize_yolo_crops(fnames, args.images_dir, args.labels_dir,
                                      pipe, label_suffix=args.label_suffix,
                                      cache_dir=args.cache_dir)

    tr_i, tr_m = build(splits["training"])
    va_i, va_m = build(splits["Val"])
    print(f"crops: train {len(tr_i)} / val {len(va_i)}")
    if args.cache_only:
        print("cache built — exiting (--cache-only).")
        return

    trainer = UNetTrainer(lr=args.lr, batch_size=args.batch)
    state = None
    if args.resume:
        import jax
        import jax.numpy as jnp

        from openglottal_tpu.utils.io import load_unet_weights

        variables = load_unet_weights(args.resume)
        state = trainer.init_state(resume_params=jax.tree.map(
            jnp.asarray, variables["params"]))
    state, best, history = trainer.fit(
        tr_i, tr_m, va_i, va_m, epochs=args.epochs, patience=args.patience,
        ckpt_dir=args.output_dir, state=state)
    print(json.dumps({"best_val_loss": min(h["loss/val"] for h in history)}))


if __name__ == "__main__":
    main()
