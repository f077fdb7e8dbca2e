"""Stage-level TPU timing probes for the fused YOLO+UNet hot path.

Times each sub-graph fetch-forced (device->host readback as the completion
fence — block_until_ready through the axon relay is unreliable, see
VERDICT.md r2) to attribute the per-video latency: U-Net forward, YOLO
forward, gate scan, area reduction, plus microbenches of candidate
optimizations (BatchNorm compute dtype, ConvTranspose lowering).

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/perf_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

C = 128  # chunk frames


def timeit(label, fn, *args, reps=5, frames=C, flops=None):
    out = fn(*args)
    jax.tree.map(np.asarray, out)  # compile + first fetch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    msg = f"{label:42s} {dt * 1e3:8.2f} ms  ({frames / dt:9.0f} fps)"
    if flops:
        msg += f"  {flops * frames / dt / 1e12:6.1f} TFLOP/s"
    print(msg, flush=True)
    return dt


def main():
    from openglottal_tpu.models.gate import gate_scan
    from openglottal_tpu.models.unet import UNet, init_unet
    from openglottal_tpu.models.yolo import YOLOv8, init_yolo, max_conf_detect
    from openglottal_tpu.pipelines import _box_area_sums

    rng = np.random.default_rng(0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uv = init_unet(k1, dtype=jnp.bfloat16)
    _, yv = init_yolo(k2, dtype=jnp.bfloat16)
    g = jax.device_put((rng.random((C, 256, 256)) * 255).astype(np.uint8))
    jax.block_until_ready(g)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    unet = UNet(dtype=jnp.bfloat16)
    yolo = YOLOv8(nc=1, dtype=jnp.bfloat16)

    @jax.jit
    def unet_fwd(uv, g):
        x = (g.astype(jnp.float32) / 255.0)[..., None]
        return unet.apply(uv, x, train=False).sum()

    @jax.jit
    def unet_masks(uv, g):
        x = (g.astype(jnp.float32) / 255.0)[..., None]
        return (jax.nn.sigmoid(unet.apply(uv, x, train=False)[..., 0]) > 0.5).sum((1, 2))

    @jax.jit
    def yolo_fwd(yv, g):
        x = (g.astype(jnp.float32) / 255.0)[..., None]
        x3 = jnp.broadcast_to(x, x.shape[:3] + (3,))
        outs = yolo.apply(yv, x3, train=False)
        return max_conf_detect(outs, 256, 256, 0.25)

    timeit("unet fwd (sum fence)", unet_fwd, uv, g, flops=23.6e9)
    timeit("unet fwd + sigmoid/threshold/area", unet_masks, uv, g, flops=23.6e9)
    timeit("yolo fwd + max-conf decode", yolo_fwd, yv, g, flops=1.25e9)

    # ── whole-video one-dispatch variants: the ONLY reliable attribution
    # through the relay (per-dispatch overhead is ~25-30 ms — see the
    # box-area-sums row — so standalone per-stage dispatches mislead) ─────
    from openglottal_tpu.models.gate import GateParams
    from openglottal_tpu.pipelines import (
        _fused_unet_only_video, _fused_yolo_unet_video,
    )

    TV = 512
    gv = jax.device_put((rng.random((TV, 256, 256)) * 255).astype(np.uint8))
    jax.block_until_ready(gv)
    timeit("FUSED video: unet+yolo+gate+areas", lambda g: _fused_yolo_unet_video(
        uv, yv, g, jnp.int32(502), conf=0.25, dtype=jnp.bfloat16,
        gate_params=GateParams()), gv, frames=TV)
    timeit("FUSED video: unet+areas only", lambda g: _fused_unet_only_video(
        uv, g, jnp.bfloat16), gv, frames=TV)

    CH = 128

    @jax.jit
    def fused_yolo_only(yv, g):
        chunks = g.reshape(TV // CH, CH, 256, 256)

        def per_chunk(gc):
            x = (gc.astype(jnp.float32) / 255.0)[..., None]
            x3 = jnp.broadcast_to(x, x.shape[:3] + (3,))
            outs = yolo.apply(yv, x3, train=False)
            return max_conf_detect(outs, 256, 256, 0.25)

        return jax.lax.map(per_chunk, chunks)

    timeit("FUSED video: yolo only (map 4x128)", fused_yolo_only, yv, gv,
           frames=TV)

    @jax.jit
    def fused_yolo_full(yv, g):
        """YOLO over ALL frames in one batch — small spatial dims mean the
        activations fit; fewer, fatter ops vs the 4-chunk map."""
        x = (g.astype(jnp.float32) / 255.0)[..., None]
        x3 = jnp.broadcast_to(x, x.shape[:3] + (3,))
        outs = yolo.apply(yv, x3, train=False)
        return max_conf_detect(outs, 256, 256, 0.25)

    timeit("FUSED video: yolo only (full 512)", fused_yolo_full, yv, gv,
           frames=TV)

    @jax.jit
    def unet_full_chunk256(uv, g):
        chunks = g.reshape(TV // 256, 256, 256, 256)

        def per_chunk(gc):
            x = (gc.astype(jnp.float32) / 255.0)[..., None]
            m = jax.nn.sigmoid(unet.apply(uv, x, train=False)[..., 0]) > 0.5
            return m.sum((1, 2)).astype(jnp.float32)

        return jax.lax.map(per_chunk, chunks)

    timeit("FUSED video: unet only (map 2x256)", unet_full_chunk256, uv, gv,
           frames=TV)

    # gate scan over a full 512-frame video of summaries
    T = 512
    has = jnp.asarray(rng.random(T) < 0.8)
    x1 = rng.uniform(0, 200, T).astype(np.float32)
    raw = jnp.asarray(np.stack([x1, x1, x1 + 40, x1 + 40], -1))
    gs = jax.jit(lambda h, r: gate_scan(h, r, 256, 256))
    timeit("gate scan (512 steps)", gs, has, raw, frames=T)

    masks = jnp.asarray(rng.random((T, 256, 256)) > 0.5)
    valids = jnp.ones((T,), bool)
    boxes = jnp.tile(jnp.asarray([[40, 40, 200, 200]], jnp.int32), (T, 1))
    timeit("box area sums (512)", _box_area_sums, masks, valids, boxes,
           frames=T)

    # ── microbenches: candidate optimizations ────────────────────────────
    # 1. BatchNorm compute dtype: f32 BN between bf16 convs forces
    #    casts/wider writes; inference BN is just scale+shift
    import flax.linen as nn

    class DC(nn.Module):
        bn_dtype: type
        out: int = 32

        @nn.compact
        def __call__(self, x):
            for _ in range(2):
                x = nn.Conv(self.out, (3, 3), padding=1, use_bias=False,
                            dtype=jnp.bfloat16, param_dtype=jnp.float32)(x)
                x = nn.BatchNorm(use_running_average=True,
                                 dtype=self.bn_dtype)(x)
                x = nn.relu(x)
            return x

    x32 = jax.device_put(rng.random((C, 256, 256, 32)).astype(np.float32))
    for bdt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        m = DC(bn_dtype=bdt)
        v = m.init(jax.random.PRNGKey(0), x32[:1])
        f = jax.jit(lambda v, x: m.apply(v, x).sum())
        timeit(f"DoubleConv 256²x32 BN-{name}", f, v, x32,
               flops=2 * (256 * 256 * 32 * 9 * 32 * 2) / C * C / C)

    # 2. ConvTranspose(2,2,s2) vs 1x1-conv + depth_to_space (exact same math)
    xs = jax.device_put(rng.random((C, 32, 32, 256)).astype(np.float32))

    ct = nn.ConvTranspose(128, (2, 2), strides=(2, 2), dtype=jnp.bfloat16,
                          param_dtype=jnp.float32)
    vct = ct.init(jax.random.PRNGKey(0), xs[:1])
    timeit("ConvTranspose 32²x256->64²x128", jax.jit(
        lambda v, x: ct.apply(v, x).sum()), vct, xs)

    c1 = nn.Conv(128 * 4, (1, 1), dtype=jnp.bfloat16, param_dtype=jnp.float32)
    vc1 = c1.init(jax.random.PRNGKey(0), xs[:1])

    @jax.jit
    def up_d2s(v, x):
        y = c1.apply(v, x)
        n, h, w, _ = y.shape
        y = y.reshape(n, h, w, 2, 2, 128)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 2, w * 2, 128)
        return y.sum()

    timeit("1x1conv + depth_to_space (same flops)", up_d2s, vc1, xs)

    # ── tracker stage attribution (guided-vft at 512 frames, 256²) ───────
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.tracker import (
        YGVFTParams, _linear_prefix, ygvft_parallel,
    )
    from openglottal_tpu.ops.blobs import top_n_blobs_batch
    from openglottal_tpu.ops.blur import gaussian_blur
    from openglottal_tpu.ops.histogram import masked_percentile_sorted

    T = 512
    vid = synthetic_video(t=T, size=256, seed=3)[0][..., 0]
    gt = jax.device_put(vid.astype(np.float32))
    jax.block_until_ready(gt)

    fv = jnp.asarray(True)
    fb = jnp.asarray([60, 60, 200, 200], jnp.int32)
    valids2 = jnp.ones((T - 2,), bool)
    boxes2 = jnp.tile(fb, (T - 2, 1))
    timeit("ygvft_parallel (510 frames e2e)", jax.jit(
        lambda g: ygvft_parallel(g[:2], fv, fb, g[2:], valids2, boxes2)[1]),
        gt, frames=T - 2)

    d = jnp.abs(gt[1:] - gt[:-1])
    timeit("gaussian_blur 13-tap (511, 256²)", jax.jit(
        lambda x: gaussian_blur(x, 13).sum()), d, frames=T - 1)

    a = jnp.full((T - 1, 256, 256), 0.02, jnp.float32)
    timeit("linear prefix scan (511, 256²)", jax.jit(
        lambda aa, b: _linear_prefix(aa, b, b[0]).sum()), a, d, frames=T - 1)

    roi = jnp.zeros((T, 256, 256), bool).at[:, 60:200, 60:200].set(True)
    timeit("masked percentile sort (512, 256²)", jax.jit(jax.vmap(
        lambda gg, rr: masked_percentile_sorted(gg, rr, 30.0))),
        gt[:T], roi, frames=T)

    raw = (gt[:T] < 90) & roi
    timeit("top_n_blobs_batch n=2 (512, 256²)", jax.jit(
        lambda m: top_n_blobs_batch(m, 2).sum()), raw, frames=T)


if __name__ == "__main__":
    main()
