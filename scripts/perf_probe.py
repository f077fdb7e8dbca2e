"""TPU measurement probes behind one CLI (consolidated round 5; formerly
perf_probe{,2,3,7,8}.py — VERDICT r4 item 7).  These are the measurement
evidence for the repo's documented perf decisions; each subcommand is cited
from the definition it justified.

Subcommands:
  stages    stage-level timing of the fused YOLO+UNet hot path: production
            vs legacy lowerings (d2s vs ConvTranspose, 1ch vs 3ch stem),
            per-resolution DoubleConv / upsampling / skip-concat costs,
            gate scan + area reduction, tracker stage overview.
            (cited from models/unet.py:32-37,118,152-164)
  followup  round-3 verification probes: split-skip decoder at full-model
            level, unrolled gate scan, bit-search percentile,
            top_n_blobs_batch internals (fixpoints vs ranking sort).
            (cited from models/unet.py:161-164, ops/blobs.py)
  chunk     frame-chunk-size sweep (128/256/512) for the fused video graph,
            serial + pipelined protocols.  (cited from pipelines.py CHUNK)
  int8      int8 vs bf16 chained-conv throughput per U-Net conv shape —
            the feasibility measurement behind models/quant.py.
            (cited from models/quant.py:8, pipelines.py int8 notes)
  tracker   guided-vft tracker stage attribution (A..F + top_n internals
            on real content).  (cited from ops/blobs.py:509, PROFILE_r03)

All probes time fetch-forced (device->host readback as the completion fence
— block_until_ready through the axon relay is unreliable) and amortise the
~25-40 ms per-dispatch relay overhead with fori-loop repetition inside one
jit where per-layer rates are quoted.  NOTE: per-layer fori-probe rates are
still overhead-diluted vs in-graph trace rates (PROFILE_r03.md round-3b
addendum) — treat trace attribution as ground truth for in-graph claims.

Usage:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/perf_probe.py \
      {stages|followup|chunk|int8|tracker}
"""

from __future__ import annotations

import argparse
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
K = int(os.environ.get("PROBE_K", 64))     # chained repeats (int8 probe)


def timeit(label, fn, *args, reps=5, frames=None, flops=None, div=1):
    out = fn(*args)
    jax.tree.map(np.asarray, out)  # compile + first fetch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / div
    msg = f"{label:48s} {dt * 1e3:8.2f} ms"
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


# ── stages: fused hot path + candidate lowerings ─────────────────────────


def cmd_stages():
    from flax import linen as nn

    from openglottal_tpu.models.fold import fold_gray_stem, fold_unet, fold_yolo
    from openglottal_tpu.models.gate import GateParams, gate_scan
    from openglottal_tpu.models.unet import DoubleConv, UNet, init_unet
    from openglottal_tpu.models.yolo import YOLOv8, init_yolo, max_conf_detect
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
    kk = 16
    print(f"-- per-layer (fori x{kk}, {C} frames) --", flush=True)
    for res, cin, cout in [(256, 1, 32), (256, 64, 32), (128, 32, 64),
                           (128, 128, 64), (64, 64, 128), (64, 256, 128),
                           (32, 128, 256), (32, 512, 256), (16, 256, 512)]:
        m = DoubleConv(cout, jnp.bfloat16, True)
        v = m.init(k1, jnp.zeros((1, res, res, cin)))
        xx = jax.device_put(jnp.asarray(
            rng.random((C, res, res, cin), np.float32), jnp.bfloat16))
        gf = 2 * 9 * (cin * cout + cout * cout) * res * res * C
        f = repeated(lambda v_, x_: m.apply(v_, x_, False), kk)
        timeit(f"  dconv {res}² {cin}->{cout}(->{cout})", f, v, xx,
               div=kk, flops=gf, frames=C)

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
               repeated(lambda v_, x_: ct.apply(v_, x_), kk), v, xx,
               div=kk, flops=gf, frames=C)
        d2s = DepthToSpaceUp(cout, jnp.bfloat16)
        timeit(f"  d2s   {res}² {cin}->{cout}",
               repeated(lambda v_, x_: d2s.apply(v_, x_), kk), v, xx,
               div=kk, flops=gf, frames=C)

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
    timeit("  concat->conv", repeated(concat_conv, kk), kern,
           (s_half, x_half), div=kk, flops=gf)
    timeit("  split conv+add", repeated(split_conv, kk), kern,
           (s_half, x_half), div=kk, flops=gf)

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

    # ── tracker stage overview (guided-vft at 512 frames, 256²) ──────────
    print("-- tracker stages --", flush=True)
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.tracker import _linear_prefix, ygvft_parallel
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


# ── followup: round-3 verification probes ────────────────────────────────


def cmd_followup():
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.fold import fold_unet
    from openglottal_tpu.models.gate import gate_scan
    from openglottal_tpu.models.tracker import ygvft_parallel
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.ops.blobs import (
        _min_prop_batch, _propagate_batch, top_n_blobs_batch,
    )
    from openglottal_tpu.ops.histogram import masked_percentile_u8_batch
    from openglottal_tpu.pipelines import _fused_unet_only_video

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    T = TV

    # ── unet-only whole video, split-skip decoder (option, not default) ──
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


# ── chunk: frame-chunk-size sweep, serial + pipelined ────────────────────


def cmd_chunk():
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


# ── int8: int8 vs bf16 chained-conv throughput ───────────────────────────
#
# Measurement notes (two earlier versions of this probe were wrong):
#   * `acc += conv(x+i, k).sum()` inside fori_loop gets algebraically
#     simplified by XLA (sum-of-conv -> function of sum(x), sum(k)): measured
#     "9 PFLOP/s".  The loop body must CHAIN: each iteration's input is the
#     previous output, so no iteration can be elided or hoisted.
#   * with K repeats too small, the ~40 ms relay dispatch+fetch round-trip
#     dominates wall time (looked like >peak TFLOP/s at K=8).  K=64 puts
#     compute at ~10x the overhead.
# The chain projects cout back to cin with a 1x1 conv and requantizes (shift
# for int8, scale for bf16) — exactly the shape of a real quantized
# inference layer, and its FLOPs are counted.


def _conv(x, k, out_dtype):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = [(1, 1), (1, 1)] if k.shape[0] == 3 else [(0, 0), (0, 0)]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=dn,
        preferred_element_type=out_dtype)


@jax.jit
def _chain_bf16(x, k, p):
    def body(i, x):
        y = _conv(x, k, jnp.bfloat16)
        z = _conv(y, p, jnp.bfloat16)
        return z * jnp.bfloat16(0.125)

    return jax.lax.fori_loop(0, K, body, x).max()


@jax.jit
def _chain_int8(x, k, p):
    def body(i, x):
        y = _conv(x, k, jnp.int32)
        y8 = (y >> 7).astype(jnp.int8)       # requant: shift + saturate-cast
        z = _conv(y8, p, jnp.int32)
        return (z >> 7).astype(jnp.int8)

    return jax.lax.fori_loop(0, K, body, x).max()


def cmd_int8():
    n = int(os.environ.get("PROBE_N", 128))  # frames per chunk
    print(f"device: {jax.devices()[0].device_kind}  (K={K}, N={n})",
          flush=True)
    rng = np.random.default_rng(0)
    # (H, cin, cout): the distinct U-Net 3x3 conv shapes at chunk=128
    shapes = [
        (256, 32, 32), (256, 64, 32),
        (128, 64, 64), (128, 128, 64),
        (64, 128, 128),
        (32, 256, 256),
        (16, 512, 512),
    ]
    for h, cin, cout in shapes:
        x8 = jnp.asarray(rng.integers(-4, 4, (n, h, h, cin)), jnp.int8)
        k8 = jnp.asarray(rng.integers(-4, 4, (3, 3, cin, cout)), jnp.int8)
        p8 = jnp.asarray(rng.integers(-4, 4, (1, 1, cout, cin)), jnp.int8)
        xb, kb, pb = (a.astype(jnp.bfloat16) for a in (x8, k8, p8))
        flops = n * h * h * cout * cin * (9 + 1) * 2  # 3x3 + 1x1 proj
        tb = timeit(f"bf16 {h}² {cin}->{cout}(->{cin})", _chain_bf16,
                    xb, kb, pb, flops=flops, reps=3, div=K)
        ti = timeit(f"int8 {h}² {cin}->{cout}(->{cin})", _chain_int8,
                    x8, k8, p8, flops=flops, reps=3, div=K)
        print(f"  -> int8 speedup {tb / ti:4.2f}x", flush=True)


# ── tracker: guided-vft stage attribution on real content ────────────────


def cmd_tracker():
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

    T = TV
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
    from openglottal_tpu.ops.blobs import _min_prop_batch, _shift_down_frame
    from openglottal_tpu.ops.blobs_pallas import (
        dual_cc_pallas_batch,
        dual_min_prop_pallas_batch,
    )

    code = jnp.where(raw, jnp.int32(1), jnp.int32(2))
    timeit("F1 dual CC fixpoint", jax.jit(
        lambda c: dual_cc_pallas_batch(c, 4096 * 8).sum()), code, frames=T)
    labFB = jax.jit(lambda c: dual_cc_pallas_batch(c, 4096 * 8))(code)
    big = jnp.int32(256 * 256)
    idx = jnp.arange(256 * 256, dtype=jnp.int32).reshape(1, 256, 256)
    labF = jnp.where(raw, labFB, big)
    labB = jnp.where(~raw, labFB, big)
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


def main():
    cmds = {"stages": cmd_stages, "followup": cmd_followup,
            "chunk": cmd_chunk, "int8": cmd_int8, "tracker": cmd_tracker}
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("command", choices=sorted(cmds))
    args = ap.parse_args()
    cmds[args.command]()


if __name__ == "__main__":
    main()
