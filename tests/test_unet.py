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


def test_d2s_upsampling_matches_conv_transpose():
    """DepthToSpaceUp (the default upsampling lowering) must reproduce
    nn.ConvTranspose exactly from the SAME variables — it is the same math
    (non-overlapping 2x2-stride-2 taps), only the XLA lowering differs."""
    _, variables = init_unet(jax.random.PRNGKey(2), size=64)
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 1)), jnp.float32)
    d2s = UNet(dtype=jnp.float32, d2s_up=True).apply(variables, x, train=False)
    ct = UNet(dtype=jnp.float32, d2s_up=False).apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(d2s), np.asarray(ct),
                               rtol=1e-5, atol=1e-5)


def test_split_skip_matches_concat():
    """The split-skip decoder (production default) must reproduce the
    concat-then-conv form from the SAME variables up to the one partial-sum
    reassociation boundary per level."""
    _, variables = init_unet(jax.random.PRNGKey(4), size=64)
    x = jnp.asarray(np.random.default_rng(2).random((2, 64, 64, 1)), jnp.float32)
    split = UNet(dtype=jnp.float32, split_skip=True).apply(
        variables, x, train=False)
    concat = UNet(dtype=jnp.float32, split_skip=False).apply(
        variables, x, train=False)
    np.testing.assert_allclose(np.asarray(split), np.asarray(concat),
                               rtol=1e-4, atol=1e-4)


def test_split_skip_param_tree_identical():
    k = jax.random.PRNGKey(5)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    va = UNet(split_skip=True).init(k, x, train=False)
    vb = UNet(split_skip=False).init(k, x, train=False)
    sa = jax.tree.map(lambda a: (a.shape, str(a.dtype)), va)
    sb = jax.tree.map(lambda a: (a.shape, str(a.dtype)), vb)
    assert jax.tree_util.tree_structure(sa) == jax.tree_util.tree_structure(sb)
    assert jax.tree.leaves(sa) == jax.tree.leaves(sb)


def test_d2s_param_tree_identical():
    """Both lowerings must declare bit-identical variable trees (names,
    shapes, dtypes), so checkpoints and torch imports are interchangeable."""
    k = jax.random.PRNGKey(3)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    va = UNet(d2s_up=True).init(k, x, train=False)
    vb = UNet(d2s_up=False).init(k, x, train=False)
    sa = jax.tree.map(lambda a: (a.shape, str(a.dtype)), va)
    sb = jax.tree.map(lambda a: (a.shape, str(a.dtype)), vb)
    assert jax.tree_util.tree_structure(sa) == jax.tree_util.tree_structure(sb)
    assert jax.tree.leaves(sa) == jax.tree.leaves(sb)


def test_segment_frames_shapes():
    model, variables = init_unet(jax.random.PRNGKey(0), size=256)
    frames = (np.random.default_rng(0).random((3, 200, 300)) * 255).astype(np.uint8)
    masks = segment_frames(variables, jnp.asarray(frames), model=model)
    assert masks.shape == (3, 200, 300)
    assert masks.dtype == jnp.bool_
