"""Throughput benchmark: YOLO+UNet detection-gated pipeline, frames/sec/chip.

Reference baseline: ~35 frames/s for the full YOLO+UNet pipeline on Apple
M-series MPS (paper/main.tex:951-954; BASELINE.md).  North star:
>=5,000 256² frames/sec/chip on TPU v5e-1 (BASELINE.json).

Measures the end-to-end video -> area-waveform path on a synthetic 502-frame
256² video (the paper's timing workload, benchmark_video_speed.py:5):
host->device transfer, batched YOLO + U-Net passes (bfloat16), temporal gate
scan, box-masked area reduction.  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import argparse

    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import GlottalPipelines

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="Write a jax.profiler trace of one batch to this dir.")
    args, _ = ap.parse_known_args()

    t_frames = 502  # paper timing workload (benchmark_video_speed.py:5)
    n_videos = 8    # steady-state batch workload (analyze_gaw processes 65)
    # decoded monochrome HSV frames — high-speed endoscopy cameras are
    # grayscale, so decode yields (T, 256, 256) uint8 per video
    videos = [np.ascontiguousarray(
        synthetic_video(t=t_frames, size=256, seed=s)[0][..., 0])
        for s in range(n_videos)]

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uvars = init_unet(k1, dtype=jnp.bfloat16)
    _, yvars = init_yolo(k2, dtype=jnp.bfloat16)
    pipe = GlottalPipelines(unet_variables=uvars, yolo_variables=yvars,
                            dtype=jnp.bfloat16)

    from openglottal_tpu.data.prefetch import prefetch_to_device

    def run_batch():
        # explicit double buffering: a background thread device_puts video
        # i+1/i+2 while the chip computes video i (jax.device_put blocks its
        # calling thread, so async dispatch alone does NOT overlap transfers)
        outs = [pipe.yolo_unet_areas_gray(g)
                for g in prefetch_to_device(videos, size=2)]
        return jax.block_until_ready(outs)

    run_batch()  # warmup / compile
    run_batch()

    if args.profile:
        with jax.profiler.trace(args.profile):
            run_batch()
        print(f"# trace written to {args.profile}", flush=True)

    # host->device bandwidth through the shared TPU tunnel fluctuates 10-20x
    # with pool contention; median-of-5 batches is robust to the spikes
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_batch()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    fps = t_frames * n_videos / dt
    fps_floor = t_frames * n_videos / max(times)  # worst-of-5: contention floor

    # diagnostics: compute-only throughput (device-resident input — what a
    # production host with direct PCIe would see) and the tunnel bandwidth
    # this run happened to get (observed range here: 0.07-2 GB/s)
    grays_dev = [jax.device_put(v) for v in videos]
    jax.block_until_ready(grays_dev)
    jax.block_until_ready([pipe.yolo_unet_areas_gray(g) for g in grays_dev])
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready([pipe.yolo_unet_areas_gray(g) for g in grays_dev])
    fps_compute = t_frames * n_videos / ((time.perf_counter() - t0) / 3)
    t0 = time.perf_counter()
    jax.block_until_ready([jax.device_put(v) for v in videos])
    mbps = sum(v.nbytes for v in videos) / (time.perf_counter() - t0) / 1e6

    baseline_fps = 35.0  # reference full pipeline, M-series MPS
    print(json.dumps({
        "metric": "yolo_unet_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "floor_fps": round(fps_floor, 1),
        "compute_only_fps": round(fps_compute, 1),
        "h2d_bandwidth_MBps": round(mbps, 1),
    }))


if __name__ == "__main__":
    main()
