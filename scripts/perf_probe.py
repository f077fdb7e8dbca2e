"""Stage-level TPU timing probes for the fused YOLO+UNet hot path.

Times each sub-graph fetch-forced (device->host readback as the completion
fence — block_until_ready through the axon relay is unreliable, see
VERDICT.md r2) to attribute the per-video latency and evaluate the candidate
lowerings:

  - production fused video (folded BN + depth-to-space upsampling + gray
    1-ch YOLO stem) vs the legacy lowering (ConvTranspose + broadcast stem)
  - per-resolution DoubleConv cost (fori_loop-repeated inside one jit so the
    ~25-30 ms per-dispatch relay overhead amortises out)
  - ConvTranspose vs 1x1-matmul+depth-to-space at every decoder size
  - concat->conv vs split conv+add for the skip connections
  - tracker stage attribution (guided-vft at 512 frames)

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/perf_probe.py
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

C = int(os.environ.get("PROBE_C", 128))    # chunk frames
TV = int(os.environ.get("PROBE_TV", 512))  # whole-video frames (mult of C)


def timeit(label, fn, *args, reps=5, frames=None, flops=None, div=1):
    out = fn(*args)
    jax.tree.map(np.asarray, out)  # compile + first fetch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / div
    msg = f"{label:46s} {dt * 1e3:8.2f} ms"
    if frames:
        msg += f"  ({frames / dt:9.0f} fps)"
    if flops:
        msg += f"  {flops / dt / 1e12:6.1f} TFLOP/s"
    print(msg, flush=True)
    return dt


def repeated(apply_fn, k=16):
    """Run apply_fn k times serially inside ONE jitted graph (input perturbed
    per iteration so XLA cannot hoist), so per-dispatch relay overhead
    amortises: per-call time = dt / k."""

    @jax.jit
    def f(v, x):
        def body(i, c):
            xp = jax.tree.map(lambda t: t + i.astype(t.dtype) * 1e-6, x)
            return c + apply_fn(v, xp).sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    return f


def main():
    from flax import linen as nn

    from openglottal_tpu.models.fold import fold_gray_stem, fold_unet, fold_yolo
    from openglottal_tpu.models.gate import GateParams, gate_scan
    from openglottal_tpu.models.unet import DoubleConv, UNet
    from openglottal_tpu.models.yolo import YOLOv8, init_yolo, max_conf_detect
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.pipelines import (
        _box_area_sums, _fused_unet_only_video, _fused_yolo_unet_video,
    )

    if C != 128:  # CPU dry-run at tiny sizes: align the pipelines' chunking
        import openglottal_tpu.pipelines as _plmod

        _plmod.CHUNK = C

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uv = init_unet(k1, dtype=jnp.bfloat16)
    _, yv = init_yolo(k2, dtype=jnp.bfloat16)
    uvf, yvf = fold_unet(uv), fold_yolo(yv)
    yvf1 = fold_gray_stem(yvf)

    g = jax.device_put((rng.random((C, 256, 256)) * 255).astype(np.uint8))
    gv = jax.device_put((rng.random((TV, 256, 256)) * 255).astype(np.uint8))
    jax.block_until_ready([g, gv])

    # ── headline: whole-video fused graphs, production vs legacy ─────────
    timeit("FUSED video PROD (d2s + 1ch stem)", lambda g_: _fused_yolo_unet_video(
        uvf, yvf1, g_, jnp.int32(502), conf=0.25, dtype=jnp.bfloat16,
        gate_params=GateParams(), fuse=True), gv, frames=TV, flops=24.9e9 * TV)

    unet_legacy = UNet(dtype=jnp.bfloat16, fuse_bn=True, d2s_up=False)
    unet_prod = UNet(dtype=jnp.bfloat16, fuse_bn=True)
    yolo = YOLOv8(nc=1, dtype=jnp.bfloat16, fuse_bn=True)

    def make_fused(unet_mod, cin, chunk):
        @jax.jit
        def fused(uv_, yv_, g_):
            chunks = g_.reshape(TV // chunk, chunk, 256, 256)

            def per_chunk(gc):
                x = (gc.astype(jnp.float32) / 255.0)[..., None]
                masks = jax.nn.sigmoid(
                    unet_mod.apply(uv_, x, train=False)[..., 0]) > 0.5
                if cin == 3:
                    x = jnp.broadcast_to(x, x.shape[:3] + (3,))
                outs = yolo.apply(yv_, x, train=False)
                has, box, _ = max_conf_detect(outs, 256, 256, 0.25)
                return masks, has, box

            masks, has, raw = jax.lax.map(per_chunk, chunks)
            valid, boxes = gate_scan(has.reshape(TV), raw.reshape(TV, 4),
                                     256, 256)
            return _box_area_sums(masks.reshape(TV, 256, 256), valid, boxes)

        return fused

    timeit("FUSED video LEGACY (convT + 3ch stem)",
           make_fused(unet_legacy, 3, C), uvf, yvf, gv,
           frames=TV, flops=24.9e9 * TV)
    if TV >= 2 * C:
        timeit(f"FUSED video PROD chunk={2 * C}",
               make_fused(unet_prod, 1, 2 * C), uvf, yvf1, gv,
               frames=TV, flops=24.9e9 * TV)

    # ── single-model whole-video attribution ─────────────────────────────
    timeit("unet-only video (d2s)", lambda g_: _fused_unet_only_video(
        uvf, g_, jnp.bfloat16, fuse=True), gv, frames=TV, flops=23.6e9 * TV)

    @jax.jit
    def unet_only_legacy(uv_, g_):
        chunks = g_.reshape(TV // C, C, 256, 256)

        def per_chunk(gc):
            x = (gc.astype(jnp.float32) / 255.0)[..., None]
            m = jax.nn.sigmoid(unet_legacy.apply(uv_, x, train=False)[..., 0]) > 0.5
            return m.sum((1, 2)).astype(jnp.float32)

        return jax.lax.map(per_chunk, chunks).reshape(TV)

    timeit("unet-only video (convT)", unet_only_legacy, uvf, gv,
           frames=TV, flops=23.6e9 * TV)

    def yolo_video(yv_, g_, cin):
        chunks = g_.reshape(TV // C, C, 256, 256)

        def per_chunk(gc):
            x = (gc.astype(jnp.float32) / 255.0)[..., None]
            if cin == 3:
                x = jnp.broadcast_to(x, x.shape[:3] + (3,))
            outs = yolo.apply(yv_, x, train=False)
            return max_conf_detect(outs, 256, 256, 0.25)

        return jax.lax.map(per_chunk, chunks)

    timeit("yolo-only video (3ch bcast)",
           jax.jit(lambda yv_, g_: yolo_video(yv_, g_, 3)), yvf, gv,
           frames=TV, flops=1.25e9 * TV)
    timeit("yolo-only video (1ch folded stem)",
           jax.jit(lambda yv_, g_: yolo_video(yv_, g_, 1)), yvf1, gv,
           frames=TV, flops=1.25e9 * TV)

    # ── per-resolution DoubleConv costs (fori-loop x16 in one jit) ───────
    K = 16
    print(f"-- per-layer (fori x{K}, {C} frames) --", flush=True)
    for res, cin, cout in [(256, 1, 32), (256, 64, 32), (128, 32, 64),
                           (128, 128, 64), (64, 64, 128), (64, 256, 128),
                           (32, 128, 256), (32, 512, 256), (16, 256, 512)]:
        m = DoubleConv(cout, jnp.bfloat16, True)
        v = m.init(k1, jnp.zeros((1, res, res, cin)))
        xx = jax.device_put(jnp.asarray(
            rng.random((C, res, res, cin), np.float32), jnp.bfloat16))
        gf = 2 * 9 * (cin * cout + cout * cout) * res * res * C
        f = repeated(lambda v_, x_: m.apply(v_, x_, False), K)
        timeit(f"  dconv {res}² {cin}->{cout}(->{cout})", f, v, xx,
               div=K, flops=gf, frames=C)

    # ── ConvTranspose vs matmul+d2s at every decoder size ────────────────
    print("-- upsampling lowering --", flush=True)
    from openglottal_tpu.models.unet import DepthToSpaceUp

    for res, cin, cout in [(128, 64, 32), (64, 128, 64), (32, 256, 128),
                           (16, 512, 256)]:
        ct = nn.ConvTranspose(cout, (2, 2), strides=(2, 2),
                              dtype=jnp.bfloat16, param_dtype=jnp.float32)
        v = ct.init(k1, jnp.zeros((1, res, res, cin)))
        xx = jax.device_put(jnp.asarray(
            rng.random((C, res, res, cin), np.float32), jnp.bfloat16))
        gf = 2 * 4 * cin * cout * res * res * C
        timeit(f"  convT {res}² {cin}->{cout}",
               repeated(lambda v_, x_: ct.apply(v_, x_), K), v, xx,
               div=K, flops=gf, frames=C)
        d2s = DepthToSpaceUp(cout, jnp.bfloat16)
        timeit(f"  d2s   {res}² {cin}->{cout}",
               repeated(lambda v_, x_: d2s.apply(v_, x_), K), v, xx,
               div=K, flops=gf, frames=C)

    # ── skip connection: concat->conv vs split conv+add (decoder d1) ─────
    print("-- skip concat lowering (256², 32+32 -> 32) --", flush=True)
    kern = jnp.asarray(rng.standard_normal((3, 3, 64, 32)) * 0.05, jnp.bfloat16)
    s_half = jax.device_put(jnp.asarray(
        rng.random((C, 256, 256, 32), np.float32), jnp.bfloat16))
    x_half = jax.device_put(jnp.asarray(
        rng.random((C, 256, 256, 32), np.float32), jnp.bfloat16))
    dn = jax.lax.conv_dimension_numbers(
        s_half.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))

    def concat_conv(k_, pair):
        s_, x_ = pair
        y = jnp.concatenate([s_, x_], -1)
        return jax.lax.conv_general_dilated(y, k_, (1, 1), "SAME",
                                            dimension_numbers=dn)

    def split_conv(k_, pair):
        s_, x_ = pair
        a = jax.lax.conv_general_dilated(
            s_, k_[:, :, :32], (1, 1), "SAME", dimension_numbers=dn)
        b = jax.lax.conv_general_dilated(
            x_, k_[:, :, 32:], (1, 1), "SAME", dimension_numbers=dn)
        return a + b

    gf = 2 * 9 * 64 * 32 * 256 * 256 * C
    timeit("  concat->conv", repeated(concat_conv, K), kern,
           (s_half, x_half), div=K, flops=gf)
    timeit("  split conv+add", repeated(split_conv, K), kern,
           (s_half, x_half), div=K, flops=gf)

    # ── gate scan + area reduction (tiny serial stages) ──────────────────
    has = jnp.asarray(rng.random(TV) < 0.8)
    x1 = rng.uniform(0, 200, TV).astype(np.float32)
    raw = jnp.asarray(np.stack([x1, x1, x1 + 40, x1 + 40], -1))
    gs = jax.jit(lambda h, r: gate_scan(h, r, 256, 256))
    timeit("gate scan (512 steps)", gs, has, raw, frames=TV)

    masks = jnp.asarray(rng.random((TV, 256, 256)) > 0.5)
    valids = jnp.ones((TV,), bool)
    boxes = jnp.tile(jnp.asarray([[40, 40, 200, 200]], jnp.int32), (TV, 1))
    timeit("box area sums (512)", _box_area_sums, masks, valids, boxes,
           frames=TV)

    # ── tracker stage attribution (guided-vft at 512 frames, 256²) ───────
    print("-- tracker stages --", flush=True)
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.tracker import (
        _linear_prefix, ygvft_parallel,
    )
    from openglottal_tpu.ops.blobs import top_n_blobs_batch
    from openglottal_tpu.ops.blur import gaussian_blur
    from openglottal_tpu.ops.histogram import masked_percentile_sorted

    T = TV
    vid = synthetic_video(t=T, size=256, seed=3)[0][..., 0]
    gt = jax.device_put(vid.astype(np.float32))
    jax.block_until_ready(gt)

    fv = jnp.asarray(True)
    fb = jnp.asarray([60, 60, 200, 200], jnp.int32)
    valids2 = jnp.ones((T - 2,), bool)
    boxes2 = jnp.tile(fb, (T - 2, 1))
    timeit("ygvft_parallel (510 frames e2e)", jax.jit(
        lambda g_: ygvft_parallel(g_[:2], fv, fb, g_[2:], valids2, boxes2)[1]),
        gt, frames=T - 2)

    d = jnp.abs(gt[1:] - gt[:-1])
    timeit("gaussian_blur 13-tap (511, 256²)", jax.jit(
        lambda x_: gaussian_blur(x_, 13).sum()), d, frames=T - 1)

    a = jnp.full((T - 1, 256, 256), 0.02, jnp.float32)
    timeit("linear prefix scan (511, 256²)", jax.jit(
        lambda aa, b: _linear_prefix(aa, b, b[0]).sum()), a, d, frames=T - 1)

    roi = jnp.zeros((T, 256, 256), bool).at[:, 60:200, 60:200].set(True)
    timeit("masked percentile sort (512, 256²)", jax.jit(jax.vmap(
        lambda gg, rr: masked_percentile_sorted(gg, rr, 30.0))),
        gt[:T], roi, frames=T)

    rawm = (gt[:T] < 90) & roi
    timeit("top_n_blobs_batch n=2 (512, 256²)", jax.jit(
        lambda m_: top_n_blobs_batch(m_, 2).sum()), rawm, frames=T)


if __name__ == "__main__":
    main()
