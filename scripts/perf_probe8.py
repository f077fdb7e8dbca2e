"""Stage attribution for the guided-vft tracker (round 3 continuation).

guided-vft end-to-end sits at ~1.1k fps (bench.py `guided_vft_fps`); this
probe times each stage of ygvft_parallel in isolation on the real TPU so the
next optimisation targets the actual bottleneck rather than the famous one.

Stages (models/tracker.py:242-277):
  A. absdiff + gaussian blur              (batched conv)
  B. lmap linear prefix (associative scan)
  C. bbox ROI + masked percentile (bit-search)
  D. thresh scalar chain (unroll=16)
  E. raw mask compare
  F. top_n_blobs_batch (fixpoints + ranking sort + paint)
plus the _gated YOLO+gate prefix the pipeline pays before the tracker.

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/perf_probe8.py
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

T = int(os.environ.get("PROBE_TV", 512))


def timeit(label, fn, *args, reps=5, frames=None):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    msg = f"{label:48s} {dt * 1e3:8.2f} ms"
    if frames:
        msg += f"  ({frames / dt:9.0f} fps)"
    print(msg, flush=True)
    return dt


def main():
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.tracker import (
        YGVFTParams,
        _linear_prefix,
        _prev_chain,
        _thresh_chain,
        ygvft_initialize,
        ygvft_parallel,
    )
    from openglottal_tpu.ops.blobs import top_n_blobs_batch
    from openglottal_tpu.ops.blur import gaussian_blur
    from openglottal_tpu.ops.histogram import masked_percentile_u8_batch

    print(f"device: {jax.devices()[0].device_kind}  T={T}", flush=True)
    p = YGVFTParams()

    vid = synthetic_video(t=T + 2, size=256, seed=3)[0][..., 0]
    gt = jax.device_put(vid.astype(np.float32))
    jax.block_until_ready(gt)
    fv = jnp.asarray(True)
    fb = jnp.asarray([60, 60, 200, 200], jnp.int32)
    valids = jnp.ones((T,), bool)
    boxes = jnp.tile(fb, (T, 1))

    timeit("ygvft_parallel e2e", jax.jit(
        lambda g: ygvft_parallel(g[:2], fv, fb, g[2:], valids, boxes)[1]),
        gt, frames=T)

    # stage inputs (computed once, device-resident)
    prev0, lmap0, thresh0 = jax.jit(
        lambda g: ygvft_initialize(g[:2], fv, fb, p))(gt)
    ff = gt[2:]
    d = jax.jit(lambda f: gaussian_blur(
        jnp.abs(f - _prev_chain(prev0, f)), p.gaussian_ksize))(ff)
    rows = jnp.arange(256)[None, :, None]
    cols = jnp.arange(256)[None, None, :]
    roi = ((rows >= boxes[:, 1, None, None]) & (rows < boxes[:, 3, None, None])
           & (cols >= boxes[:, 0, None, None])
           & (cols < boxes[:, 2, None, None]) & valids[:, None, None])
    cur, n_px = jax.jit(lambda f, r: masked_percentile_u8_batch(
        f, r, p.glottal_percentile))(ff, roi)
    thresh = jax.jit(lambda t0, c, n: _thresh_chain(
        t0, c, n, valids, p.beta))(jnp.asarray(thresh0), cur, n_px)
    raw = jax.jit(lambda f, t, r: (f < t[:, None, None]) & r)(ff, thresh, roi)
    jax.block_until_ready((d, cur, thresh, raw))

    timeit("A absdiff+blur (513 frames)", jax.jit(
        lambda f: gaussian_blur(jnp.abs(f - _prev_chain(prev0, f)),
                                p.gaussian_ksize)), ff, frames=T)
    a_l = jnp.full((T, 1, 1), 1.0 - p.alpha)
    timeit("B lmap linear prefix", jax.jit(
        lambda dd: _linear_prefix(a_l, p.alpha * dd, lmap0[None])), d,
        frames=T)
    timeit("C masked percentile (bit-search)", jax.jit(
        lambda f, r: masked_percentile_u8_batch(f, r, p.glottal_percentile)),
        ff, roi, frames=T)
    timeit("D thresh chain (512 scalars)", jax.jit(
        lambda t0, c, n: _thresh_chain(t0, c, n, valids, p.beta)),
        jnp.asarray(thresh0), cur, n_px, frames=T)
    timeit("E raw compare", jax.jit(
        lambda f, t, r: ((f < t[:, None, None]) & r).sum()), ff, thresh, roi,
        frames=T)
    timeit("F top_n_blobs_batch", jax.jit(
        lambda m: top_n_blobs_batch(m, p.max_glottal_components).sum()), raw,
        frames=T)

    # F internals on the real raw masks (content-dependent convergence)
    from openglottal_tpu.ops.blobs import _min_prop_batch
    from openglottal_tpu.ops.blobs_pallas import (
        dual_cc_pallas_batch,
        dual_min_prop_pallas_batch,
    )

    masks = np.asarray(raw)
    code = jnp.where(raw, jnp.int32(1), jnp.int32(2))
    timeit("F1 dual CC fixpoint", jax.jit(
        lambda c: dual_cc_pallas_batch(c, 4096 * 8).sum()), code, frames=T)
    labFB = jax.jit(lambda c: dual_cc_pallas_batch(c, 4096 * 8))(code)
    big = jnp.int32(256 * 256)
    idx = jnp.arange(256 * 256, dtype=jnp.int32).reshape(1, 256, 256)
    labF = jnp.where(raw, labFB, big)
    labB = jnp.where(~raw, labFB, big)
    from openglottal_tpu.ops.blobs import _shift_down_frame
    fgp_seed = jnp.where((~raw) & (labB == idx),
                         _shift_down_frame(labF, big), big)
    bgp_seed = jnp.where(raw & (labF == idx),
                         _shift_down_frame(labB, big), big)
    seed = jnp.where(raw, bgp_seed, fgp_seed)
    timeit("F2 dual min-prop (parents)", jax.jit(
        lambda c, s: dual_min_prop_pallas_batch(c, s, 4096 * 8).sum()),
        code, seed, frames=T)
    seed_nh = jnp.where(~raw, 1, big)   # shape stand-in for the nh pass
    timeit("F3 nh min-prop (bg only)", jax.jit(
        lambda r, s: _min_prop_batch(r, s, 4, 4096).sum()), ~raw, seed_nh,
        frames=T)
    timeit("F4 owner min-prop (union)", jax.jit(
        lambda r, s: _min_prop_batch(r, s, 8, 4096).sum()), raw,
        jnp.where(raw, labF, big), frames=T)
    om = jnp.where(raw, idx, big).reshape(T, -1)
    timeit("F5 ranking sort (unstable)", jax.jit(
        lambda x: jax.lax.sort(x, dimension=1, is_stable=False)[:, :4].sum()),
        om, frames=T)


if __name__ == "__main__":
    main()
