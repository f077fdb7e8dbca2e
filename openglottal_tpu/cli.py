"""Command-line interface (reference openglottal/cli.py:9-116, extended).

Subcommands:
  run            video -> features.json (pipelines vft / guided-vft / unet /
                 unet-only / crop-unet)                       [cli.py:17-29]
  build-dataset  masks -> YOLO-format detection dataset       [cli.py:31-36]
  train-unet     U-Net training (full-frame or crop mode)
  train-yolo     YOLOv8n detector training
  eval-girafe / eval-bagls / analyze-gaw / infer / benchmark
                 delegate to the scripts/ drivers

Weight arguments accept our orbax checkpoint directories or reference-style
torch .pt files (U-Net).  Per-pipeline weight requirements mirror the
reference's parser errors (cli.py:58-82).
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        prog="openglottal-tpu",
        description="TPU-native automated glottal area segmentation from "
                    "high-speed videoendoscopy.",
    )
    parser.add_argument("--config", help="YAML/JSON config path (live, unlike "
                                         "the reference's default.yaml).")
    sub = parser.add_subparsers(dest="command", required=True)

    run_p = sub.add_parser("run", help="Run inference on a video file.")
    run_p.add_argument("video", help="Path to input .avi / .mp4 video.")
    run_p.add_argument("--yolo-weights", help="YOLO checkpoint (required for "
                                              "vft, guided-vft, unet, crop-unet).")
    run_p.add_argument("--unet-weights", help="U-Net checkpoint (required for "
                                              "unet, unet-only).")
    run_p.add_argument("--crop-weights", help="Crop-trained U-Net checkpoint "
                                              "(required for crop-unet).")
    run_p.add_argument("--pipeline",
                       choices=["vft", "guided-vft", "unet", "unet-only",
                                "crop-unet"],
                       default="unet")
    run_p.add_argument("--output", "-o", default="results")
    run_p.add_argument("--conf", type=float, default=None,
                       help="YOLO confidence threshold (default from config).")
    run_p.add_argument("--quant", choices=["int8", "int8-full"], default=None,
                       help="int8 serving mode: the U-Net runs post-training"
                            "-quantized (calibrated on the input video; "
                            "models/quant.py).  Applies to the unet/unet-only"
                            " whole-video paths; ~1.5x faster on TPU v5e.  "
                            "'int8-full' also quantizes the YOLO detector "
                            "(measured perf-neutral on v5e; detection then "
                            "deviates from bf16 within tested tolerances).")
    run_p.add_argument("--calib", default=None, metavar="VIDEO",
                       help="Explicit int8 calibration video (first 64 "
                            "frames); without it calibration is lazy on the "
                            "input video itself.")
    run_p.add_argument("--qparams", default=None, metavar="NPZ",
                       help="Persisted int8 calibration: loaded if the file "
                            "exists (serving numerics independent of input "
                            "order), else written after calibration.")
    run_p.add_argument("--stream", type=int, default=0, metavar="CHUNK",
                       help="Process the video in CHUNK-frame segments with "
                            "bounded memory (all five pipelines; gate and "
                            "tracker state carry across segments — results "
                            "are identical to whole-video processing, for "
                            "the trackers to their sequential forms).")

    bd_p = sub.add_parser("build-dataset",
                          help="Build a YOLO detection dataset from masks.")
    bd_p.add_argument("--images-dir", required=True)
    bd_p.add_argument("--labels-dir", required=True)
    bd_p.add_argument("--training-json", required=True)
    bd_p.add_argument("--output-dir", default="yolo_data")
    bd_p.add_argument("--force", action="store_true")
    bd_p.add_argument("--mask-suffix", default="")

    # train/eval/analysis subcommands delegate to the scripts/ drivers
    script_cmds = {
        "train-unet": "train_unet", "train-unet-crop": "train_unet_crop",
        "train-yolo": "train_yolo", "eval-girafe": "eval_girafe",
        "eval-bagls": "eval_bagls", "sweep-bagls": "sweep_bagls_conf",
        "analyze-gaw": "analyze_gaw", "plot-gaw": "plot_gaw",
        "infer": "infer", "benchmark": "benchmark_video_speed",
        "download-datasets": "download_datasets",
    }
    for name, module in script_cmds.items():
        sub.add_parser(name, add_help=False,
                       help=f"Delegates to scripts/{module}.py (its own --help).")

    args, extra = parser.parse_known_args(argv)

    if args.command == "run":
        _cmd_run(run_p, args)
    elif args.command == "build-dataset":
        _cmd_build_dataset(args)
    elif args.command in script_cmds:
        _delegate(script_cmds[args.command], extra)


def _delegate(module: str, argv: list[str]) -> None:
    import runpy
    from pathlib import Path

    script = Path(__file__).resolve().parents[1] / "scripts" / f"{module}.py"
    sys.argv = [str(script)] + list(argv)
    runpy.run_path(str(script), run_name="__main__")


def _cmd_run(parser: argparse.ArgumentParser, args) -> None:
    from openglottal_tpu.config import load_config

    cfg = load_config(args.config)
    if args.conf is not None:
        cfg.detector.conf = args.conf

    needs_yolo = args.pipeline in ("vft", "guided-vft", "unet", "crop-unet")
    needs_unet = args.pipeline in ("unet", "unet-only")
    if needs_yolo and not args.yolo_weights:
        parser.error(f"--yolo-weights is required for the {args.pipeline} pipeline.")
    if needs_unet and not args.unet_weights:
        parser.error(f"--unet-weights is required for the {args.pipeline} pipeline.")
    if args.pipeline == "crop-unet" and not args.crop_weights:
        parser.error("--crop-weights is required for the crop-unet pipeline.")

    from openglottal_tpu.data.video import load_frames_bgr
    from openglottal_tpu.pipelines import GlottalPipelines
    from openglottal_tpu.utils.io import (
        load_unet_weights,
        load_yolo_weights,
        save_features_json,
    )

    pipe = GlottalPipelines(
        unet_variables=load_unet_weights(args.unet_weights) if args.unet_weights else None,
        crop_unet_variables=load_unet_weights(args.crop_weights) if args.crop_weights else None,
        yolo_variables=load_yolo_weights(args.yolo_weights) if args.yolo_weights else None,
        conf=cfg.detector.conf,
        gate_params=cfg.gate_params(),
        vft_params=cfg.vft_params(),
        ygvft_params=cfg.ygvft_params(),
        quant=args.quant,
    )

    if args.quant:
        import os as _os

        from openglottal_tpu.data.video import bgr_to_gray_u8

        if args.qparams and _os.path.exists(args.qparams):
            pipe.load_qparams(args.qparams)
        elif args.calib:
            pipe.calibrate(bgr_to_gray_u8(load_frames_bgr(args.calib)[:64]))
        if args.qparams and not _os.path.exists(args.qparams):
            if pipe._qparams is None:
                pipe.calibrate(bgr_to_gray_u8(load_frames_bgr(args.video)[:64]))
            pipe.save_qparams(args.qparams)
            print(f"int8 calibration saved to {args.qparams}")
    elif args.calib or args.qparams:
        parser.error("--calib/--qparams need --quant int8 or int8-full")

    if args.stream:
        from openglottal_tpu.data.video import iter_frames_bgr

        feats = pipe.stream_features(
            iter_frames_bgr(args.video, chunk=args.stream), args.pipeline)
    else:
        frames = load_frames_bgr(args.video)
        feats = pipe.extract_features(frames, args.pipeline)
    if feats is None:
        print("No glottis detected — check your weights or input video.")
        sys.exit(1)

    out_path = os.path.join(args.output, "features.json")
    save_features_json(feats, out_path)
    print(f"Features saved to {out_path}")
    for k, v in feats.items():
        if not k.startswith("_"):
            print(f"  {k}: {v:.4f}" if isinstance(v, float) else f"  {k}: {v}")


def _cmd_build_dataset(args) -> None:
    from openglottal_tpu.data.yolo_dataset import build_yolo_dataset

    yaml_path = build_yolo_dataset(
        images_dir=args.images_dir,
        labels_dir=args.labels_dir,
        training_json=args.training_json,
        output_dir=args.output_dir,
        force=args.force,
        mask_suffix=args.mask_suffix,
    )
    print(f"YAML config written to {yaml_path}")


if __name__ == "__main__":
    main()
