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
