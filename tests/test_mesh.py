"""Multi-chip paths on the 8-device virtual CPU mesh: dp training step,
frame-sharded inference, shard placement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglottal_tpu.parallel.mesh import make_mesh, shard_batch, replicate


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(n_data=8)


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 8, "model": 1}


def test_shard_and_replicate(mesh):
    x = np.zeros((16, 4), np.float32)
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8
    p = replicate(mesh, {"w": np.ones((3, 3), np.float32)})
    assert p["w"].sharding.is_fully_replicated


def test_dp_training_step(mesh):
    from openglottal_tpu.train.unet_trainer import UNetTrainer

    rng = np.random.default_rng(0)
    imgs = (rng.random((16, 256, 256)) * 255).astype(np.uint8)
    msks = (rng.random((16, 256, 256)) > 0.8).astype(np.uint8)
    tr = UNetTrainer(batch_size=8, dtype=jnp.float32, mesh=mesh)
    state, best, hist = tr.fit(imgs, msks, imgs[:8], msks[:8], epochs=2,
                               verbose=False)
    assert hist[1]["loss/train"] < hist[0]["loss/train"] * 1.5
    assert np.isfinite(hist[-1]["loss/val"])


def test_frame_sharded_parallel_tracker(mesh):
    """The parallel tracker formulation (linear recurrences as
    associative_scan) shards over the frame axis — the sequential scan
    cannot.  Sharded result must equal unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.data.video import bgr_to_gray_u8
    from openglottal_tpu.models.tracker import ygvft_parallel

    T = 34  # 2 init + 32 tracked (divisible by 8)
    g = bgr_to_gray_u8(synthetic_video(t=T, size=256, seed=6)[0]).astype(jnp.float32)
    fv = jnp.asarray(True)
    fb = jnp.asarray([100, 100, 160, 160], jnp.int32)
    valids = jnp.ones((T - 2,), bool)
    boxes = jnp.tile(fb, (T - 2, 1))

    _, base = ygvft_parallel(g[:2], fv, fb, g[2:], valids, boxes)

    spec = NamedSharding(mesh, P("data"))
    gs = jax.device_put(g[2:], spec)
    vs = jax.device_put(valids, spec)
    bs = jax.device_put(boxes, spec)
    _, sharded = ygvft_parallel(g[:2], fv, fb, gs, vs, bs)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=0.5)


def test_frame_sharded_pipeline_matches_single(mesh):
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.data.video import bgr_to_gray_u8
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.pipelines import GlottalPipelines

    _, uv = init_unet(jax.random.PRNGKey(0), dtype=jnp.float32)
    frames, _ = synthetic_video(t=10, size=256, seed=1)
    gray = np.asarray(bgr_to_gray_u8(frames))

    single = GlottalPipelines(unet_variables=uv, dtype=jnp.float32)
    multi = GlottalPipelines(unet_variables=uv, dtype=jnp.float32, mesh=mesh)
    m1 = np.asarray(single.segment_video(gray))
    m8 = np.asarray(multi.segment_video(gray))
    np.testing.assert_array_equal(m1, m8)


@pytest.fixture(scope="module")
def pipes_1_vs_8(mesh):
    """The SAME mesh-routed production code on a 1-device and an 8-device
    mesh — pins that frame sharding never changes pipeline results (the
    round-2 gap: GlottalPipelines(mesh=...) silently ran its fused hot
    path, streaming segments, and both trackers on one device)."""
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import GlottalPipelines

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uv = init_unet(k1, dtype=jnp.float32)
    _, yv = init_yolo(k2, dtype=jnp.float32)

    def make(m):
        return GlottalPipelines(unet_variables=uv, crop_unet_variables=uv,
                                yolo_variables=yv, conf=0.0,
                                dtype=jnp.float32, mesh=m)

    return make(make_mesh(n_data=1, devices=jax.devices()[:1])), make(mesh)


@pytest.fixture(scope="module")
def mesh_video():
    from openglottal_tpu.data.synthetic import synthetic_video

    return synthetic_video(t=12, size=256, seed=5)[0]


@pytest.mark.parametrize(
    "pipeline", ["unet-only", "unet", "crop-unet", "vft", "guided-vft"])
def test_all_pipelines_1_vs_8_devices(pipes_1_vs_8, mesh_video, pipeline):
    p1, p8 = pipes_1_vs_8
    from openglottal_tpu.data.video import bgr_to_gray_u8
    from openglottal_tpu.pipelines import _box_area_sums

    if pipeline == "unet-only":
        gray = np.asarray(bgr_to_gray_u8(mesh_video))
        a1 = np.asarray(p1.unet_only_areas(gray))
        a8 = np.asarray(p8.unet_only_areas(gray))
    elif pipeline == "unet":
        a1 = np.asarray(p1.yolo_unet_areas(mesh_video))
        a8 = np.asarray(p8.yolo_unet_areas(mesh_video))
    elif pipeline == "crop-unet":
        m1, v1, b1 = p1.crop_unet_masks(mesh_video)
        m8, v8, b8 = p8.crop_unet_masks(mesh_video)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v8))
        a1 = np.asarray(m1).sum((1, 2)).astype(np.float32)
        a8 = np.asarray(m8).sum((1, 2)).astype(np.float32)
    elif pipeline == "vft":
        a1, a8 = p1.vft_areas(mesh_video), p8.vft_areas(mesh_video)
    else:
        a1 = p1.guided_vft_areas(mesh_video)
        a8 = p8.guided_vft_areas(mesh_video)
    np.testing.assert_allclose(a1, a8, atol=0.5, err_msg=pipeline)


def test_tensor_parallel_model_axis(pipes_1_vs_8, mesh_video):
    """model axis exercised >1: conv out-channels shard over a (data=4,
    model=2) mesh (parallel/mesh.shard_model_params, Megatron-style column
    split; GSPMD inserts the collectives).  Results must equal the 1-device
    mesh run."""
    from openglottal_tpu.data.video import bgr_to_gray_u8
    from openglottal_tpu.pipelines import GlottalPipelines
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.models.yolo import init_yolo

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uv = init_unet(k1, dtype=jnp.float32)
    _, yv = init_yolo(k2, dtype=jnp.float32)
    tp_mesh = make_mesh(n_data=4, n_model=2)
    assert tp_mesh.shape == {"data": 4, "model": 2}
    p_tp = GlottalPipelines(unet_variables=uv, yolo_variables=yv, conf=0.0,
                            dtype=jnp.float32, mesh=tp_mesh)
    # param placement really is split over 'model'
    k = p_tp.unet_variables["params"]["DoubleConv_1"]["Conv_0"]["kernel"]
    assert "model" in str(k.sharding.spec)

    p1, _ = pipes_1_vs_8
    gray = np.asarray(bgr_to_gray_u8(mesh_video))
    np.testing.assert_array_equal(
        np.asarray(p1.segment_video(gray)), np.asarray(p_tp.segment_video(gray)))
    np.testing.assert_allclose(
        np.asarray(p1.yolo_unet_areas_gray(gray)),
        np.asarray(p_tp.yolo_unet_areas_gray(gray)), atol=0.5)


def test_stream_areas_1_vs_8_devices(pipes_1_vs_8, mesh_video):
    p1, p8 = pipes_1_vs_8

    def chunks():
        yield mesh_video[:7]
        yield mesh_video[7:]

    a1 = p1.stream_areas(chunks(), "unet")
    a8 = p8.stream_areas(chunks(), "unet")
    np.testing.assert_allclose(a1, a8, atol=0.5)
