"""Round-3 probe #3: frame-chunk-size sweep for the fused video graph, and
the pipelined (dispatch-all, fetch-all) protocol that separates chip
throughput from the per-dispatch relay round-trip.

Context (perf_probe.py + the jax.profiler trace): the fused YOLO+UNet video
module runs 107.75 ms ON DEVICE (4,752 fps, ~60% bf16 MFU), but each serial
wall-clock video pays ~40 ms of relay dispatch+fetch latency.  Larger chunks
cut lax.map trip count; pipelining K videos amortises the relay latency.

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/perf_probe3.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

TV = 512


def main():
    from openglottal_tpu.models.fold import fold_unet, fold_yolo
    from openglottal_tpu.models.gate import gate_scan
    from openglottal_tpu.models.unet import UNet, init_unet
    from openglottal_tpu.models.yolo import YOLOv8, init_yolo, max_conf_detect
    from openglottal_tpu.pipelines import _box_area_sums

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uv = init_unet(k1, dtype=jnp.bfloat16)
    _, yv = init_yolo(k2, dtype=jnp.bfloat16)
    uvf, yvf = fold_unet(uv), fold_yolo(yv)

    unet = UNet(dtype=jnp.bfloat16, fuse_bn=True)
    yolo = YOLOv8(nc=1, dtype=jnp.bfloat16, fuse_bn=True)

    def make_fused(chunk):
        @jax.jit
        def fused(uv_, yv_, g_):
            chunks = g_.reshape(TV // chunk, chunk, 256, 256)

            def per_chunk(gc):
                x = (gc.astype(jnp.float32) / 255.0)[..., None]
                masks = jax.nn.sigmoid(
                    unet.apply(uv_, x, train=False)[..., 0]) > 0.5
                x3 = jnp.broadcast_to(x, x.shape[:3] + (3,))
                outs = yolo.apply(yv_, x3, train=False)
                has, box, _ = max_conf_detect(outs, 256, 256, 0.25)
                return masks, has, box

            masks, has, raw = jax.lax.map(per_chunk, chunks)
            valid, boxes = gate_scan(has.reshape(TV), raw.reshape(TV, 4),
                                     256, 256)
            return _box_area_sums(masks.reshape(TV, 256, 256), valid, boxes)

        return fused

    vids = [jax.device_put((rng.random((TV, 256, 256)) * 255).astype(np.uint8))
            for _ in range(8)]
    jax.block_until_ready(vids)

    for chunk in (128, 256, 512):
        f = make_fused(chunk)
        np.asarray(f(uvf, yvf, vids[0]))  # compile + fetch
        # serial (per-video wall latency, fetch-forced)
        ts = []
        for v in vids[:5]:
            t0 = time.perf_counter()
            np.asarray(f(uvf, yvf, v))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        # pipelined: dispatch all 8, then fetch all (throughput protocol)
        t0 = time.perf_counter()
        outs = [f(uvf, yvf, v) for v in vids]
        for o in outs:
            np.asarray(o)
        dt_p = (time.perf_counter() - t0) / len(vids)
        print(f"chunk={chunk:3d}: serial {dt*1e3:7.2f} ms ({TV/dt:6.0f} fps)"
              f"   pipelined {dt_p*1e3:7.2f} ms/video ({TV/dt_p:6.0f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
