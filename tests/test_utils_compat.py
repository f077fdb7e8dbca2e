"""Reference openglottal.utils surface under openglottal_tpu.utils: same
names, same numpy semantics (pinned against cv2-composed oracles)."""

import cv2
import numpy as np
import pytest

from openglottal_tpu import utils as U

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("shape", [(200, 320), (320, 200), (256, 256), (100, 100)])
def test_letterbox_roundtrip_geometry(shape):
    img = (RNG.random(shape) * 255).astype(np.uint8)
    boxed, pt, pl, ch, cw = U.letterbox_with_info(img)
    assert boxed.shape == (256, 256)
    # reference math: scale to longest side, round, center
    scale = 256 / max(shape)
    assert (ch, cw) == (int(round(shape[0] * scale)), int(round(shape[1] * scale)))
    np.testing.assert_array_equal(boxed, U.letterbox(img))
    # geometry re-application matches
    msk = (RNG.random(shape) > 0.5).astype(np.uint8) * 255
    mb = U.letterbox_apply_geometry(msk, 256, pt, pl, ch, cw)
    assert mb.shape == (256, 256)
    want = cv2.resize(msk, (cw, ch), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(mb[pt:pt + ch, pl:pl + cw], want)
    # unletterbox round-trips the content
    back = U.unletterbox(mb, pt, pl, ch, cw, shape[0], shape[1])
    assert back.shape == shape


def test_metrics_conventions():
    a = (RNG.random((32, 32)) > 0.5).astype(np.uint8)
    b = (RNG.random((32, 32)) > 0.5).astype(np.uint8)
    inter = float(((a > 0) & (b > 0)).sum())
    d_ref = 2 * inter / (a.sum() + b.sum())
    i_ref = inter / (((a > 0) | (b > 0)).sum())
    assert abs(U.dice(a, b) - d_ref) < 1e-6
    assert abs(U.iou(a, b) - i_ref) < 1e-6
    z = np.zeros((8, 8), np.uint8)
    assert U.dice(z, z) == 1.0 and U.iou(z, z) == 1.0
    loss = float(U.dice_loss(np.zeros((4, 4)), np.ones((4, 4))))
    assert 0.0 < loss < 1.0


def test_unet_segment_frame_shapes():
    import jax
    import jax.numpy as jnp

    from openglottal_tpu.models.unet import init_unet

    _, uv = init_unet(jax.random.PRNGKey(0), dtype=jnp.float32)
    frame = (RNG.random((100, 120)) * 255).astype(np.uint8)
    out = U.unet_segment_frame(frame, uv)
    assert out.shape == frame.shape
    assert out.dtype == np.uint8
    assert set(np.unique(out)) <= {0, 255}


def test_npz_weights_roundtrip(tmp_path):
    """save_weights_npz / load_weights_npz preserve the nested variable tree
    exactly (the in-repo weights/demo_*.npz format; loaders accept .npz
    alongside orbax dirs and torch .pt)."""
    from openglottal_tpu.utils.io import (load_unet_weights, load_weights_npz,
                                          save_weights_npz)

    tree = {
        "params": {"Conv_0": {"kernel": RNG.random((3, 3, 1, 4)).astype(np.float32),
                              "bias": np.zeros(4, np.float32)}},
        "batch_stats": {"BatchNorm_0": {"mean": RNG.random(4).astype(np.float32)}},
    }
    path = tmp_path / "w.npz"
    save_weights_npz(tree, path)
    for got in (load_weights_npz(path), load_unet_weights(path)):
        np.testing.assert_array_equal(got["params"]["Conv_0"]["kernel"],
                                      tree["params"]["Conv_0"]["kernel"])
        np.testing.assert_array_equal(
            got["batch_stats"]["BatchNorm_0"]["mean"],
            tree["batch_stats"]["BatchNorm_0"]["mean"])
        assert got["params"]["Conv_0"]["bias"].shape == (4,)
