"""Follow-up TPU probes (round 3): verify the measured-lowering fixes and
attribute top_n_blobs_batch internals.

Run AFTER scripts/perf_probe.py (baselines in that output):
  - unet-only whole video with the split-skip decoder (baseline 130.0 ms)
  - gate scan unrolled x16 (baseline 69.7 ms standalone)
  - ygvft_parallel with bit-search percentile + unrolled thresh chain
    (baseline 359.3 ms / 510 frames)
  - masked_percentile_u8_batch vs the vmapped sort (baseline 107.0 ms)
  - top_n_blobs_batch split: CC fixpoints vs the ranking sort

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/perf_probe2.py
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

TV = int(os.environ.get("PROBE_TV", 512))


def timeit(label, fn, *args, reps=5, frames=None):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    msg = f"{label:46s} {dt * 1e3:8.2f} ms"
    if frames:
        msg += f"  ({frames / dt:9.0f} fps)"
    print(msg, flush=True)
    return dt


def main():
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.fold import fold_unet
    from openglottal_tpu.models.gate import gate_scan
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.models.tracker import ygvft_parallel
    from openglottal_tpu.ops.blobs import (
        _min_prop_batch, _propagate_batch, top_n_blobs_batch,
    )
    from openglottal_tpu.ops.histogram import masked_percentile_u8_batch
    from openglottal_tpu.pipelines import _fused_unet_only_video

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    T = TV

    # ── unet-only whole video, split-skip decoder (now default) ──────────
    _, uv = init_unet(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    uvf = fold_unet(uv)
    gv = jax.device_put((rng.random((T, 256, 256)) * 255).astype(np.uint8))
    jax.block_until_ready(gv)
    timeit("unet-only video (split-skip)", lambda g: _fused_unet_only_video(
        uvf, g, jnp.bfloat16, fuse=True), gv, frames=T)

    # ── gate scan, unrolled ──────────────────────────────────────────────
    has = jnp.asarray(rng.random(T) < 0.8)
    x1 = rng.uniform(0, 200, T).astype(np.float32)
    raw = jnp.asarray(np.stack([x1, x1, x1 + 40, x1 + 40], -1))
    timeit("gate scan unroll=16 (512 steps)",
           jax.jit(lambda h, r: gate_scan(h, r, 256, 256)), has, raw, frames=T)

    # ── tracker core with bit-search percentile + unrolled chain ─────────
    vid = synthetic_video(t=T, size=256, seed=3)[0][..., 0]
    gt = jax.device_put(vid.astype(np.float32))
    jax.block_until_ready(gt)
    fv = jnp.asarray(True)
    fb = jnp.asarray([60, 60, 200, 200], jnp.int32)
    valids2 = jnp.ones((T - 2,), bool)
    boxes2 = jnp.tile(fb, (T - 2, 1))
    timeit("ygvft_parallel v2 (510 frames e2e)", jax.jit(
        lambda g: ygvft_parallel(g[:2], fv, fb, g[2:], valids2, boxes2)[1]),
        gt, frames=T - 2)

    roi = jnp.zeros((T, 256, 256), bool).at[:, 60:200, 60:200].set(True)
    timeit("percentile bit-search (512, 256²)", jax.jit(
        lambda v, m: masked_percentile_u8_batch(v, m, 30.0)), gt, roi,
        frames=T)

    # ── top_n internals: fixpoints vs ranking sort ───────────────────────
    rawm = (gt < 90) & roi
    timeit("top_n_blobs_batch v (512, 256²)", jax.jit(
        lambda m: top_n_blobs_batch(m, 2).sum()), rawm, frames=T)
    timeit("  CC propagate 8-conn (512)", jax.jit(
        lambda m: _propagate_batch(m, 4096, 8).sum()), rawm, frames=T)
    timeit("  CC propagate 4-conn bg (512)", jax.jit(
        lambda m: _propagate_batch(~m, 4096, 4).sum()), rawm, frames=T)
    idx = jnp.arange(256 * 256, dtype=jnp.int32).reshape(1, 256, 256)
    seed = jnp.where(rawm, idx, 256 * 256)
    timeit("  min-prop fixpoint (512)", jax.jit(
        lambda m, s: _min_prop_batch(m, s, 8, 4096).sum()), rawm, seed,
        frames=T)
    om = jnp.where(rawm, idx, 256 * 256).reshape(T, -1)
    timeit("  ranking sort i32 (512, 65536)", jax.jit(
        lambda x: jnp.sort(x, axis=1)[:, :4].sum()), om, frames=T)


if __name__ == "__main__":
    main()
