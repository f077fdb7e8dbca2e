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
