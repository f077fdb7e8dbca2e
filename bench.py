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
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import GlottalPipelines

    t_frames = 502  # paper timing workload (benchmark_video_speed.py:5)
    frames, _ = synthetic_video(t=t_frames, size=256, seed=0)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uvars = init_unet(k1, dtype=jnp.bfloat16)
    _, yvars = init_yolo(k2, dtype=jnp.bfloat16)
    pipe = GlottalPipelines(unet_variables=uvars, yolo_variables=yvars,
                            dtype=jnp.bfloat16)

    def run():
        areas = pipe.yolo_unet_areas(jnp.asarray(frames))
        return jax.block_until_ready(areas)

    run()  # warmup / compile
    run()

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    dt = (time.perf_counter() - t0) / n_iters
    fps = t_frames / dt

    baseline_fps = 35.0  # reference full pipeline, M-series MPS
    print(json.dumps({
        "metric": "yolo_unet_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
