"""Full-frame U-Net training on GIRAFE/BAGLS (TPU).

Reference recipe (scripts/train_unet.py in /root/reference): loss = 0.5·BCE +
0.5·dice (:178), AdamW lr 1e-3 + cosine T_max=epochs (:156-157), batch 16,
50 epochs, best-val checkpoint + --patience early stop (:204-213), --resume
loads weights with a fresh optimizer (:147-151).  TPU differences: the whole
dataset is materialised to device-resident uint8 arrays once, augmentation
runs fused on device, and --mesh-data shards the batch across chips.
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
    p.add_argument("--label-suffix", default="", help='"_seg" for BAGLS.')
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--resume", default=None, help="Weights to warm-start from "
                   "(orbax dir or torch .pt); optimizer starts fresh.")
    p.add_argument("--output-dir", default="outputs/unet")
    p.add_argument("--cache-dir", default="outputs/cache")
    p.add_argument("--val-key", default="Val")
    p.add_argument("--tensorboard", default=None,
                   help="TensorBoard log dir (reference train_unet.py:166).")
    p.add_argument("--hdf5-cache", default=None,
                   help="Load a reference-format HDF5 cache instead of PNGs "
                        "(data.py:200-329; expects <name>_train.h5/_val.h5).")
    args = p.parse_args()

    import jax

    from openglottal_tpu.data.dataset import load_split_json, materialize_split
    from openglottal_tpu.train.unet_trainer import UNetTrainer

    splits = load_split_json(args.training_json)
    print(f"train {len(splits['training'])} / val {len(splits[args.val_key])}")
    if args.hdf5_cache:
        from openglottal_tpu.data.dataset import load_glottis_hdf5

        tr_i, tr_m = load_glottis_hdf5(f"{args.hdf5_cache}_train.h5")
        va_i, va_m = load_glottis_hdf5(f"{args.hdf5_cache}_val.h5")
    else:
        tr_i, tr_m = materialize_split(splits["training"], args.images_dir,
                                       args.labels_dir, args.label_suffix,
                                       cache_dir=args.cache_dir)
        va_i, va_m = materialize_split(splits[args.val_key], args.images_dir,
                                       args.labels_dir, args.label_suffix,
                                       cache_dir=args.cache_dir)

    trainer = UNetTrainer(lr=args.lr, batch_size=args.batch)
    state = None
    if args.resume:
        from openglottal_tpu.utils.io import load_unet_weights

        variables = load_unet_weights(args.resume)
        state = trainer.init_state(resume_params=jax.tree.map(
            jax.numpy.asarray, variables["params"]))
        state = state.replace(batch_stats=jax.tree.map(
            jax.numpy.asarray, variables["batch_stats"]))
        print(f"Resumed weights from {args.resume} (fresh optimizer)")

    state, best, history = trainer.fit(
        tr_i, tr_m, va_i, va_m, epochs=args.epochs, patience=args.patience,
        ckpt_dir=args.output_dir, state=state, tensorboard_dir=args.tensorboard,
    )
    best_val = min(h["loss/val"] for h in history)
    print(json.dumps({"best_val_loss": best_val, "epochs_run": len(history)}))


if __name__ == "__main__":
    main()
