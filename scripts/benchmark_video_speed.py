"""Inference throughput benchmark (reference scripts/benchmark_video_speed.py).

Validates the paper's speed claim — the reference targets 502 frames in ~11 s
(≥45.6 fps) for the U-Net path on Apple M-series (:5, :119-127).  On TPU we
benchmark both the U-Net-only and the full YOLO+UNet paths, batched; prints a
✓/✗ against the reference claim plus the measured frames/sec.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--video", default=None, help="Real video; default synthetic.")
    p.add_argument("--frames", type=int, default=502)
    p.add_argument("--unet-weights", default=None)
    p.add_argument("--yolo-weights", default=None)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from openglottal_tpu.data.video import bgr_to_gray_u8, load_frames_bgr
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import GlottalPipelines
    from openglottal_tpu.utils.io import load_unet_weights, load_yolo_weights

    if args.video:
        frames = load_frames_bgr(args.video)
    else:
        from openglottal_tpu.data.synthetic import synthetic_video

        frames, _ = synthetic_video(t=args.frames, size=256, seed=0)
    t_frames = len(frames)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    uv = (load_unet_weights(args.unet_weights) if args.unet_weights
          else init_unet(k1, dtype=jnp.bfloat16)[1])
    yv = (load_yolo_weights(args.yolo_weights) if args.yolo_weights
          else init_yolo(k2, dtype=jnp.bfloat16)[1])
    pipe = GlottalPipelines(unet_variables=uv, yolo_variables=yv,
                            dtype=jnp.bfloat16)
    gray = np.asarray(bgr_to_gray_u8(frames))
    rng = np.random.default_rng(0)

    def timed(fn, label, claim_fps=None):
        """Audited protocol (bench.py / VERDICT r2): every timed iteration
        runs on DISTINCT content (fresh low-amplitude uint8 noise) and ends
        with a device->host readback — block_until_ready through the TPU
        relay is not a reliable completion fence."""
        noise = np.zeros(gray.shape, np.uint8)
        fn(noise)  # warmup/compile
        np.asarray(fn(noise))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            np.asarray(fn(rng.integers(0, 8, gray.shape, dtype=np.uint8)))
        dt = (time.perf_counter() - t0) / args.iters
        fps = t_frames / dt
        line = f"  {label:<22} {t_frames} frames in {dt:6.3f} s  =  {fps:8.1f} fps"
        if claim_fps is not None:
            line += "   " + ("✓" if fps >= claim_fps else "✗") + \
                    f" (reference claim ≥{claim_fps} fps)"
        print(line, flush=True)
        return fps

    print(f"Benchmark on {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})")
    # numpy in: the pipelines do ONE fast device_put per call (never
    # jnp.asarray — 10x slower through the TPU tunnel; see pipelines.to_device)
    # noise is replicated across channels so monochrome sources stay
    # monochrome (single-channel transfer path)
    timed(lambda n: pipe.unet_only_areas(gray ^ n), "U-Net only",
          claim_fps=45.6)
    timed(lambda n: pipe.yolo_unet_areas(frames ^ n[..., None]),
          "YOLO+UNet", claim_fps=35.0)


if __name__ == "__main__":
    main()
