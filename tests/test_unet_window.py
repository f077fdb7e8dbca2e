"""Split U-Net forward + box-windowed 256²-level decoder tail.

Pins the two properties the windowed yolo+unet hot path rests on:
  1. unet_apply_to_mid ∘ unet_tail_full == UNet.apply bit-for-bit;
  2. unet_tail_window's logits equal the full-frame tail's values on every
     window pixel (interior, edge-clamped, and corner origins).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglottal_tpu.models.fold import fold_batchnorm
from openglottal_tpu.models.unet import (
    UNet,
    init_unet,
    unet_apply_to_mid,
    unet_tail_full,
    unet_tail_window,
    window_origins,
)


@pytest.fixture(scope="module")
def folded():
    _, v = init_unet(jax.random.PRNGKey(0), dtype=jnp.float32, size=256)
    return fold_batchnorm(v, 1e-5)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.random((3, 256, 256, 1)), jnp.float32)


def test_split_compose_matches_apply(folded, frames):
    model = UNet(dtype=jnp.float32, fuse_bn=True)
    want = model.apply(folded, frames, train=False)
    y_mid, skip1 = unet_apply_to_mid(folded, frames, jnp.float32, True)
    assert y_mid.shape == (3, 128, 128, 64) and skip1.shape == (3, 256, 256, 32)
    got = unet_tail_full(folded, y_mid, skip1, jnp.float32, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("origin", [(64, 38), (0, 0), (128, 128), (0, 128)])
def test_window_tail_matches_full(folded, frames, origin):
    y_mid, skip1 = unet_apply_to_mid(folded, frames, jnp.float32, True)
    full = np.asarray(unet_tail_full(folded, y_mid, skip1, jnp.float32, True))
    oy = jnp.full((3,), origin[0], jnp.int32)
    ox = jnp.full((3,), origin[1], jnp.int32)
    win = np.asarray(unet_tail_window(folded, y_mid, skip1, oy, ox,
                                      jnp.float32))
    ref = np.stack([
        full[i, origin[0]:origin[0] + 128, origin[1]:origin[1] + 128]
        for i in range(3)])
    np.testing.assert_allclose(win, ref, rtol=0, atol=2e-5)


def test_window_tail_mixed_origins(folded, frames):
    y_mid, skip1 = unet_apply_to_mid(folded, frames, jnp.float32, True)
    full = np.asarray(unet_tail_full(folded, y_mid, skip1, jnp.float32, True))
    oys, oxs = [0, 64, 128], [128, 2, 66]
    win = np.asarray(unet_tail_window(
        folded, y_mid, skip1, jnp.asarray(oys, jnp.int32),
        jnp.asarray(oxs, jnp.int32), jnp.float32))
    for i, (y, x) in enumerate(zip(oys, oxs)):
        np.testing.assert_allclose(
            win[i], full[i, y:y + 128, x:x + 128], rtol=0, atol=2e-5)


def test_window_origins_semantics():
    boxes = jnp.asarray([
        [40, 60, 100, 120],    # 60x60 box -> fits
        [0, 0, 126, 126],      # exactly at the bound
        [10, 10, 140, 80],     # 130 wide -> does not fit
    ], jnp.int32)
    valid = jnp.asarray([True, True, False])
    fits, oy, ox = window_origins(boxes, valid, 256, 256, 128)
    # the oversized box is invalid, so it is excluded from the fits test
    assert bool(fits)
    assert np.all(np.asarray(oy) % 2 == 0) and np.all(np.asarray(ox) % 2 == 0)
    # windows cover their boxes ([x0, x1) within [ox, ox+128))
    b, y, x = np.asarray(boxes), np.asarray(oy), np.asarray(ox)
    for i in range(2):
        assert x[i] <= b[i, 0] and b[i, 2] <= x[i] + 128
        assert y[i] <= b[i, 1] and b[i, 3] <= y[i] + 128
    # a valid oversized box kills the fast path
    fits2, _, _ = window_origins(boxes, jnp.asarray([True, True, True]),
                                 256, 256, 128)
    assert not bool(fits2)
