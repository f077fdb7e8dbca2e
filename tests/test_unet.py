"""U-Net architecture: parameter count, shapes, segment_frames wrapper."""

import jax
import jax.numpy as jnp
import numpy as np

from openglottal_tpu.models.unet import UNet, init_unet, segment_frames


def test_param_count_matches_reference():
    """Reference U-Net is 7.76M params (paper/main.tex:368-369)."""
    _, variables = init_unet(jax.random.PRNGKey(0), size=64)
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert abs(n - 7.76e6) / 7.76e6 < 0.01, f"{n} params"


def test_forward_shape_and_dtype():
    model, variables = init_unet(jax.random.PRNGKey(0), size=64)
    x = jnp.zeros((2, 64, 64, 1))
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 64, 64, 1)
    assert y.dtype == jnp.float32


def test_train_mode_updates_batch_stats():
    model, variables = init_unet(jax.random.PRNGKey(0), size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    y, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_segment_frames_shapes():
    model, variables = init_unet(jax.random.PRNGKey(0), size=256)
    frames = (np.random.default_rng(0).random((3, 200, 300)) * 255).astype(np.uint8)
    masks = segment_frames(variables, jnp.asarray(frames), model=model)
    assert masks.shape == (3, 200, 300)
    assert masks.dtype == jnp.bool_
