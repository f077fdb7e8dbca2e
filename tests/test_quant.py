"""int8 post-training quantization (models/quant.py): weight-quantization
fidelity, layer math, and end-to-end mask agreement with the bf16 model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglottal_tpu.models.fold import fold_unet
from openglottal_tpu.models.quant import (
    quantize_unet,
    quantize_weights,
    qunet_chunk_masks,
)
from openglottal_tpu.models.unet import UNet, init_unet

RNG = np.random.default_rng(7)


def test_quantize_weights_roundtrip():
    """Dequantized int8 weights must match the originals within one step of
    the per-channel scale (symmetric round-to-nearest)."""
    w = RNG.standard_normal((3, 3, 16, 32)).astype(np.float32)
    w[..., 3] *= 40.0  # one channel with a much larger range
    w8, sw = quantize_weights(w)
    assert w8.dtype == np.int8 and sw.shape == (32,)
    err = np.abs(w8.astype(np.float32) * sw - w)
    assert (err <= sw / 2 + 1e-7).all()
    # all-zero channel: scale stays finite
    w[..., 5] = 0
    w8, sw = quantize_weights(w)
    assert np.isfinite(sw).all() and (w8[..., 5] == 0).all()


def _calib_frames(n=4, size=64):
    """Smooth synthetic frames with a dark blob (glottis-like)."""
    y, x = np.mgrid[0:size, 0:size]
    frames = []
    for i in range(n):
        cx, cy = size // 2 + 3 * i, size // 2 - 2 * i
        blob = np.exp(-(((x - cx) / 9.0) ** 2 + ((y - cy) / 5.0) ** 2))
        base = 150 + 40 * np.sin(x / 11.0 + i) * np.cos(y / 13.0)
        frames.append(np.clip(base - 120 * blob, 0, 255))
    return np.stack(frames).astype(np.uint8)


def _scaled_variables(key=0, size=64):
    """Folded U-Net variables with non-trivial BN stats so activation ranges
    vary per layer (init stats would make calibration trivial)."""
    _, variables = init_unet(jax.random.PRNGKey(key), dtype=jnp.float32,
                             size=size)
    stats = jax.tree.map(lambda a: a, variables["batch_stats"])

    def perturb(path, a):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        r = RNG.standard_normal(a.shape).astype(np.float32)
        return np.abs(r) * 0.5 + 0.5 if name == "var" else 0.2 * r

    stats = jax.tree_util.tree_map_with_path(perturb, stats)
    return fold_unet({"params": variables["params"], "batch_stats": stats})


def test_qunet_masks_agree_with_bf16():
    """End-to-end PTQ fidelity: int8 mask flips vs the bf16 model may only
    occur where the bf16 logit is already near zero — i.e. the quantization
    error is small in LOGIT space.  (A random-init net concentrates all its
    logits near 0, the worst case for raw flip counting — trained-model Dice
    is gated separately by the TPU selftest.)"""
    folded = _scaled_variables()
    frames = _calib_frames(n=6)
    q = quantize_unet(folded, frames[:3])

    got = np.asarray(qunet_chunk_masks(q, jnp.asarray(frames)))

    model = UNet(dtype=jnp.bfloat16, fuse_bn=True)
    x = (jnp.asarray(frames).astype(jnp.float32) / 255.0)[..., None]
    logits = np.asarray(model.apply(folded, x, train=False)[..., 0])
    ref = logits > 0

    agree = (got == ref).mean()
    assert agree > 0.95, f"mask agreement {agree:.4f}"
    flipped = got != ref
    if flipped.any():
        # every flip sits within 10% of the logit range around zero
        assert np.abs(logits[flipped]).max() < 0.1 * np.abs(logits).max(), (
            f"flip at |logit| {np.abs(logits[flipped]).max():.4f} of "
            f"max {np.abs(logits).max():.4f}")


def test_qunet_shapes_and_determinism():
    folded = _scaled_variables(key=1)
    frames = _calib_frames(n=2)
    q = quantize_unet(folded, frames)
    m1 = np.asarray(qunet_chunk_masks(q, jnp.asarray(frames)))
    m2 = np.asarray(qunet_chunk_masks(q, jnp.asarray(frames)))
    assert m1.shape == frames.shape and m1.dtype == bool
    np.testing.assert_array_equal(m1, m2)


@pytest.mark.parametrize("mode", ["int8", "int8-full"])
def test_int8_pipeline_areas_track_bf16(mode):
    """GlottalPipelines(quant=...): the YOLO+UNet and unet-only waveforms
    must track the bf16 pipeline closely ('int8' shares the bf16 detector —
    identical gate decisions; 'int8-full' quantizes it too, within the
    tested detection tolerances)."""
    import openglottal_tpu.pipelines as plmod
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import GlottalPipelines

    video, _ = synthetic_video(t=8, size=256, seed=11)
    gray = np.ascontiguousarray(video[..., 0])
    _, uv = init_unet(jax.random.PRNGKey(2), dtype=jnp.float32, size=256)
    _, yv = init_yolo(jax.random.PRNGKey(3), dtype=jnp.float32)

    # shrink the frame-chunk AND the bucket padding so the fused 256² graphs
    # stay CPU-runnable in test time — XLA:CPU's s8xs8 convs are reference-
    # speed, so the production 128-frame padding would grind (the production
    # CHUNK=128 graph is exercised on TPU by bench.py / selftest).  jit
    # caches key on the padded shapes, so this cannot leak into other tests.
    old_chunk, old_bucket = plmod.CHUNK, plmod._bucket
    plmod.CHUNK = 8
    plmod._bucket = lambda t, chunk=8: max(chunk, -(-t // chunk) * chunk)
    try:
        mk = lambda q: GlottalPipelines(unet_variables=uv, yolo_variables=yv,
                                        conf=0.0, dtype=jnp.float32, quant=q)
        ref = np.asarray(mk(None).yolo_unet_areas_gray(gray))
        got = np.asarray(mk(mode).yolo_unet_areas_gray(gray))
        # areas differ only by boundary-pixel flips of near-zero logits
        denom = np.maximum(ref, 1.0)
        assert (np.abs(got - ref) / denom).max() < 0.08, (got, ref)

        ref5 = np.asarray(mk(None).unet_only_areas(gray))
        got5 = np.asarray(mk(mode).unet_only_areas(gray))
        assert (np.abs(got5 - ref5) / np.maximum(ref5, 1.0)).max() < 0.08
    finally:
        plmod.CHUNK = old_chunk
        plmod._bucket = old_bucket


def test_int8_multi_matches_per_video():
    """yolo_unet_areas_gray_multi in the int8 serving mode (ONE quantized
    cohort graph per batch, ``_fused_yolo_unet_multi_q``) vs per-video int8
    calls: bit-identical per video across mixed lengths — same quantized
    per-chunk graph, shared calibration, causal per-video gate scans."""
    import openglottal_tpu.pipelines as plmod
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import GlottalPipelines

    g1 = np.ascontiguousarray(synthetic_video(t=8, size=256, seed=11)[0][..., 0])
    g2 = np.ascontiguousarray(synthetic_video(t=5, size=256, seed=12)[0][..., 0])
    _, uv = init_unet(jax.random.PRNGKey(2), dtype=jnp.float32, size=256)
    _, yv = init_yolo(jax.random.PRNGKey(3), dtype=jnp.float32)

    old_chunk, old_bucket = plmod.CHUNK, plmod._bucket
    plmod.CHUNK = 8
    plmod._bucket = lambda t, chunk=8: max(chunk, -(-t // chunk) * chunk)
    try:
        pipe = GlottalPipelines(unet_variables=uv, yolo_variables=yv,
                                conf=0.0, dtype=jnp.float32, quant="int8")
        per = [np.asarray(pipe.yolo_unet_areas_gray(g)) for g in (g1, g2)]
        multi = pipe.yolo_unet_areas_gray_multi([g1, g2])
        for want, got in zip(per, multi):
            np.testing.assert_array_equal(want, got)
    finally:
        plmod.CHUNK = old_chunk
        plmod._bucket = old_bucket


def test_quantize_unet_requires_folded():
    _, variables = init_unet(jax.random.PRNGKey(0), dtype=jnp.float32,
                             size=64)
    with pytest.raises(ValueError):
        quantize_unet(variables, _calib_frames(n=1))


def _yolo_folded(key=5):
    from openglottal_tpu.models.fold import fold_yolo
    from openglottal_tpu.models.yolo import init_yolo

    _, yvars = init_yolo(jax.random.PRNGKey(key), dtype=jnp.float32, size=64)
    rng = np.random.default_rng(key)  # order-independent determinism
    stats = jax.tree_util.tree_map_with_path(
        lambda p, a: (np.abs(rng.standard_normal(a.shape)).astype(np.float32)
                      * 0.5 + 0.5
                      if getattr(p[-1], "key", "") == "var"
                      else 0.2 * rng.standard_normal(a.shape).astype(
                          np.float32)),
        yvars["batch_stats"])
    return fold_yolo({"params": yvars["params"], "batch_stats": stats})


def test_yolo_walker_matches_flax():
    """The structural walker's bf16 (calibration) pass must reproduce the
    flax YOLOv8(fuse_bn=True) forward exactly — it is the wiring that the
    int8 path then quantizes."""
    from openglottal_tpu.models.quant import _YoloWalk
    from openglottal_tpu.models.yolo import YOLOv8

    folded = _yolo_folded()
    x_raw = jnp.asarray(RNG.integers(0, 256, (2, 64, 64, 3)), jnp.float32)
    ref = YOLOv8(nc=1, dtype=jnp.bfloat16, fuse_bn=True).apply(
        folded, x_raw / 255.0, train=False)
    got = _YoloWalk(folded["params"], "calib").forward(x_raw)
    for (rb, rc), (gb, gc) in zip(ref, got):
        np.testing.assert_allclose(np.asarray(gb, np.float32),
                                   np.asarray(rb, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(gc, np.float32),
                                   np.asarray(rc, np.float32),
                                   rtol=0.05, atol=0.05)


def test_qyolo_detections_track_bf16():
    """int8 YOLO: the full decoded anchor fields must track the bf16 model —
    near-equal confidences everywhere and near-equal boxes (argmax-box
    comparison would be ill-posed on a random-init net whose conf landscape
    is flat: a near-tie can legitimately pick a different anchor)."""
    from openglottal_tpu.models.quant import quantize_yolo, qyolo_outputs
    from openglottal_tpu.models.yolo import YOLOv8, decode_boxes

    rng = np.random.default_rng(61)
    folded = _yolo_folded(key=6)
    calib = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3)), jnp.float32)
    x_raw = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3)), jnp.float32)

    qp = quantize_yolo(folded, calib)
    ref = YOLOv8(nc=1, dtype=jnp.bfloat16, fuse_bn=True).apply(
        folded, x_raw / 255.0, train=False)
    got = qyolo_outputs(qp, x_raw)

    rbox, rconf = decode_boxes(ref, 64, 64)
    gbox, gconf = decode_boxes(got, 64, 64)
    np.testing.assert_allclose(np.asarray(gconf), np.asarray(rconf),
                               atol=0.06)
    np.testing.assert_allclose(np.asarray(gbox), np.asarray(rbox), atol=5.0)


def test_quant_rejects_bad_mode():
    """Unknown quant modes fail loudly."""
    from openglottal_tpu.pipelines import GlottalPipelines

    _, uv = init_unet(jax.random.PRNGKey(0), dtype=jnp.float32, size=64)
    with pytest.raises(ValueError, match="quant"):
        GlottalPipelines(unet_variables=uv, quant="fp8")


def test_qparams_roundtrip(tmp_path):
    """save_qparams/load_qparams must restore the calibration exactly —
    int8 kernels, f32 scales/biases, bf16 tails, and the python-float
    act_scales (VERDICT r3 item 6: serving numerics must not depend on
    arrival order, so calibration persists with the checkpoint)."""
    from openglottal_tpu.models.quant import load_qparams, save_qparams

    qp = {"unet": quantize_unet(_scaled_variables(size=64),
                                _calib_frames(size=64))}
    save_qparams(qp, tmp_path / "qp.npz")
    back = load_qparams(tmp_path / "qp.npz")

    flat_a = jax.tree.leaves(qp)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_array_equal(a, b)
    # act_scales restore as python floats (jit constants, like fresh calib)
    assert all(isinstance(v, float)
               for v in back["unet"]["act_scales"].values())

    # restored calibration drives the quantized model identically
    g = _calib_frames(size=64)
    m1 = np.asarray(qunet_chunk_masks(qp["unet"], jnp.asarray(g)))
    m2 = np.asarray(qunet_chunk_masks(back["unet"], jnp.asarray(g)))
    np.testing.assert_array_equal(m1, m2)


def test_int8_under_mesh_matches_single_device(tmp_path):
    """int8 serving under a frame-sharded mesh (_sharded_yolo_unet_video_q /
    _qunet_sharded_chunk) must equal the 1-device mesh run bit-for-bit with
    the SAME persisted calibration — the round-3 fastest-mode-vs-scale-out
    exclusivity is gone."""
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.parallel.mesh import make_mesh
    from openglottal_tpu.pipelines import GlottalPipelines

    video, _ = synthetic_video(t=8, size=256, seed=11)
    gray = np.ascontiguousarray(video[..., 0])
    _, uv = init_unet(jax.random.PRNGKey(2), dtype=jnp.float32, size=256)
    _, yv = init_yolo(jax.random.PRNGKey(3), dtype=jnp.float32)

    mk = lambda n: GlottalPipelines(
        unet_variables=uv, yolo_variables=yv, conf=0.0, dtype=jnp.float32,
        quant="int8", mesh=make_mesh(n_data=n, n_model=1,
                                     devices=jax.devices()[:n]))
    p1, p8 = mk(1), mk(8)
    p1.calibrate(gray)
    p1.save_qparams(tmp_path / "qp.npz")
    p8.load_qparams(tmp_path / "qp.npz")

    a1 = np.asarray(p1.yolo_unet_areas_gray(gray))
    a8 = np.asarray(p8.yolo_unet_areas_gray(gray))
    np.testing.assert_array_equal(a1, a8)

    u1 = np.asarray(p1.unet_only_areas(gray))
    u8 = np.asarray(p8.unet_only_areas(gray))
    np.testing.assert_array_equal(u1, u8)
