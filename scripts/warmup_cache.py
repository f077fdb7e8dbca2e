"""Precompile the hot graphs into the persistent JAX compilation cache.

Through the axon TPU tunnel a cold compile of a big graph takes 4-6 minutes;
with the cache warm it is <1 s.  Run this once per machine (or after a JAX
upgrade) so production runs — eval sweeps, the 65-patient GAW study, training
— never stall on compilation.

Covers: U-Net/YOLO inference chunks (f32+bf16), the fused per-video paths,
gate scans, crop-UNet chunks, tracker scans at 256², and both train steps.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import GlottalPipelines

    t0 = time.time()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uv = init_unet(k1, dtype=jnp.bfloat16)
    _, yv = init_yolo(k2, dtype=jnp.bfloat16)
    pipe = GlottalPipelines(unet_variables=uv, crop_unet_variables=uv,
                            yolo_variables=yv, dtype=jnp.bfloat16)
    frames, _ = synthetic_video(t=130, size=256, seed=0)
    gray = np.ascontiguousarray(frames[..., 0])

    steps = [
        ("fused yolo+unet video", lambda: pipe.yolo_unet_areas_gray(gray)),
        ("fused unet-only video", lambda: pipe.unet_only_areas(gray)),
        ("bgr chunks + gate", lambda: pipe.yolo_unet_areas(frames)),
        ("crop-unet chunks", lambda: pipe.crop_unet_masks(frames)[0]),
        ("guided-vft scan", lambda: pipe.guided_vft_areas(frames)),
        ("vft scan", lambda: pipe.vft_areas(frames)),
    ]
    for name, fn in steps:
        t1 = time.time()
        jax.block_until_ready(fn())
        print(f"  {name:<24} {time.time()-t1:6.1f} s", flush=True)

    # train steps
    from openglottal_tpu.train.unet_trainer import UNetTrainer
    from openglottal_tpu.train.yolo_trainer import YoloTrainer

    rng = np.random.default_rng(0)
    imgs = (rng.random((16, 256, 256)) * 255).astype(np.uint8)
    msks = (rng.random((16, 256, 256)) > 0.8).astype(np.uint8)
    t1 = time.time()
    ut = UNetTrainer(batch_size=16)
    ut.fit(imgs, msks, imgs, msks, epochs=1, verbose=False)
    print(f"  {'unet train step':<24} {time.time()-t1:6.1f} s", flush=True)
    t1 = time.time()
    yt = YoloTrainer(batch_size=16)
    boxes = np.tile(np.array([100, 100, 150, 160], np.float32), (16, 1))
    yt.fit(np.repeat(imgs[..., None], 3, -1), boxes, epochs=1, verbose=False)
    print(f"  {'yolo train step':<24} {time.time()-t1:6.1f} s", flush=True)
    print(f"cache warm ({time.time()-t0:.0f}s total)")


if __name__ == "__main__":
    main()
