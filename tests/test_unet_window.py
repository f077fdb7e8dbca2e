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
    _tail_from_ymw,
    chunk_window_origin,
    init_unet,
    unet_apply_to_d3,
    unet_apply_to_mid,
    unet_mid_full,
    unet_mid_window,
    unet_tail_full,
    unet_tail_window,
    unet_tail_window_chunk,
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


@pytest.mark.parametrize("origin", [(64, 38), (2, 2), (94, 94), (2, 94)])
def test_window_tail_chunk_matches_full(folded, frames, origin):
    """Chunk-uniform interior window (the production form): bit-equal to the
    full tail on the window — the halo reads real in-frame neighbours, so
    no zero-pad emulation is involved."""
    y_mid, skip1 = unet_apply_to_mid(folded, frames, jnp.float32, True)
    full = np.asarray(unet_tail_full(folded, y_mid, skip1, jnp.float32, True))
    win = np.asarray(unet_tail_window_chunk(
        folded, y_mid, skip1, jnp.int32(origin[0]), jnp.int32(origin[1]),
        jnp.float32, 160))
    ref = full[:, origin[0]:origin[0] + 160, origin[1]:origin[1] + 160]
    np.testing.assert_allclose(win, ref, rtol=0, atol=2e-5)


def test_d3_split_compose_matches_apply(folded, frames):
    model = UNet(dtype=jnp.float32, fuse_bn=True)
    want = np.asarray(model.apply(folded, frames, train=False))
    d3out, skip2, skip1 = unet_apply_to_d3(folded, frames, jnp.float32, True)
    assert d3out.shape == (3, 64, 64, 128) and skip2.shape == (3, 128, 128, 64)
    y_mid = unet_mid_full(folded, d3out, skip2, jnp.float32, True)
    got = np.asarray(unet_tail_full(folded, y_mid, skip1, jnp.float32, True))
    np.testing.assert_array_equal(got, want)
    # and the mid block equals the to-mid split's output
    y_mid2, _ = unet_apply_to_mid(folded, frames, jnp.float32, True)
    np.testing.assert_array_equal(np.asarray(y_mid), np.asarray(y_mid2))


@pytest.mark.parametrize("origin", [(66, 38), (6, 6), (90, 90), (6, 90)])
def test_mid_window_matches_full(folded, frames, origin):
    """Both decoder levels windowed (the production form): mid window ==
    the full y_mid's (win/2+2)² slice; composed logits == full tail."""
    oy, ox = origin
    assert oy % 4 == 2 and ox % 4 == 2
    d3out, skip2, skip1 = unet_apply_to_d3(folded, frames, jnp.float32, True)
    y_mid = unet_mid_full(folded, d3out, skip2, jnp.float32, True)
    full = np.asarray(unet_tail_full(folded, y_mid, skip1, jnp.float32, True))

    ymw = unet_mid_window(folded, d3out, skip2, jnp.int32(oy), jnp.int32(ox),
                          jnp.float32, 160)
    ref_mid = np.asarray(y_mid)[:, oy // 2 - 1:oy // 2 + 81,
                                ox // 2 - 1:ox // 2 + 81]
    np.testing.assert_allclose(np.asarray(ymw), ref_mid, rtol=0, atol=2e-5)

    logits = np.asarray(_tail_from_ymw(folded, ymw, skip1, jnp.int32(oy),
                                       jnp.int32(ox), jnp.float32, 160))
    np.testing.assert_allclose(logits, full[:, oy:oy + 160, ox:ox + 160],
                               rtol=0, atol=2e-5)


def test_chunk_window_origin_mid_lattice():
    boxes = jnp.asarray([[60, 80, 140, 170]], jnp.int32)
    valid = jnp.ones((1,), bool)
    fits, oy, ox = chunk_window_origin(boxes, valid, 256, 256, 160,
                                       lattice=4, margin=6)
    assert bool(fits)
    oy, ox = int(oy), int(ox)
    assert oy % 4 == 2 and ox % 4 == 2 and 6 <= oy <= 90 and 6 <= ox <= 90
    assert ox <= 60 and 140 <= ox + 160 and oy <= 80 and 170 <= oy + 160


def test_chunk_window_origin_semantics():
    boxes = jnp.asarray([
        [40, 60, 100, 120],
        [50, 70, 110, 130],
        [200, 200, 250, 250],   # far away box, but invalid
    ], jnp.int32)
    valid = jnp.asarray([True, True, False])
    fits, oy, ox = chunk_window_origin(boxes, valid, 256, 256, 160)
    assert bool(fits)
    oy, ox = int(oy), int(ox)
    assert oy % 2 == 0 and ox % 2 == 0 and 2 <= oy <= 94 and 2 <= ox <= 94
    # window covers the union of the VALID boxes
    assert ox <= 40 and 110 <= ox + 160
    assert oy <= 60 and 130 <= oy + 160
    # valid far-away box breaks containment -> fallback
    fits2, _, _ = chunk_window_origin(boxes, jnp.asarray([True, True, True]),
                                      256, 256, 160)
    assert not bool(fits2)
    # border-touching union -> fallback (window must stay interior)
    fits3, _, _ = chunk_window_origin(
        jnp.asarray([[0, 10, 60, 80]], jnp.int32), jnp.asarray([True]),
        256, 256, 160)
    assert not bool(fits3)
    # no valid frames -> windowed path fine (areas are 0 anyway)
    fits4, oy4, ox4 = chunk_window_origin(boxes, jnp.zeros((3,), bool),
                                          256, 256, 160)
    assert bool(fits4) and 2 <= int(oy4) <= 94


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
