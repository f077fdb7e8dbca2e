"""Gaussian blur, masked percentile, Otsu vs cv2/numpy oracles."""

import cv2
import numpy as np
import pytest

from openglottal_tpu.ops import gaussian_blur, masked_percentile_u8, otsu_threshold

RNG = np.random.default_rng(1)


@pytest.mark.parametrize("ksize,sigma", [(13, 0.0), (5, 1.2), (3, 0.7), (13, 2.0)])
def test_gaussian_blur_matches_cv2(ksize, sigma):
    img = RNG.random((64, 80)).astype(np.float32) * 255
    want = cv2.GaussianBlur(img, (ksize, ksize), sigma)
    got = np.asarray(gaussian_blur(img, ksize, sigma=sigma))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_gaussian_blur_batched():
    imgs = RNG.random((4, 33, 47)).astype(np.float32)
    got = np.asarray(gaussian_blur(imgs, 13))
    for i in range(4):
        want = cv2.GaussianBlur(imgs[i], (13, 13), 0)
        np.testing.assert_allclose(got[i], want, atol=1e-4)


@pytest.mark.parametrize("q", [5.0, 30.0, 50.0, 95.0])
def test_masked_percentile_matches_numpy(q):
    vals = (RNG.random((50, 60)) * 255).astype(np.uint8)
    mask = RNG.random((50, 60)) > 0.6
    want = np.percentile(vals[mask], q)
    got = float(masked_percentile_u8(vals, mask, q, fallback=127.0))
    assert abs(got - want) < 1e-4


def test_masked_percentile_empty_mask_fallback():
    vals = (RNG.random((10, 10)) * 255).astype(np.uint8)
    mask = np.zeros((10, 10), bool)
    got = float(masked_percentile_u8(vals, mask, 5.0, fallback=127.0))
    assert got == 127.0


def test_otsu_matches_cv2():
    for _ in range(5):
        # bimodal image like a glottis crop
        a = RNG.normal(60, 12, (40, 40))
        b = RNG.normal(180, 20, (40, 40))
        pick = RNG.random((40, 40)) > 0.3
        img = np.where(pick, b, a).clip(0, 255).astype(np.uint8)
        t_cv, _ = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        t = float(otsu_threshold(img))
        assert abs(t - t_cv) <= 1.0


def test_masked_percentile_sorted_matches_hist():
    """Sort-based percentile must equal the histogram percentile (and
    np.percentile) exactly on integer-valued inputs, for every n incl. tiny
    masks."""
    import jax.numpy as jnp
    from openglottal_tpu.ops.histogram import (
        masked_histogram_u8, masked_percentile_sorted, percentile_from_hist,
    )

    rng = np.random.default_rng(3)
    for q in (5.0, 30.0, 50.0, 95.0):
        for trial in range(8):
            v = rng.integers(0, 256, (24, 32)).astype(np.uint8)
            m = rng.random((24, 32)) < (0.002 + 0.2 * trial)
            hv, hn = percentile_from_hist(
                masked_histogram_u8(jnp.asarray(v), jnp.asarray(m)), q)
            sv, sn = masked_percentile_sorted(jnp.asarray(v), jnp.asarray(m), q)
            assert int(hn) == int(sn) == int(m.sum())
            if m.sum() > 0:
                np.testing.assert_allclose(float(sv), float(hv), atol=1e-5)
                np.testing.assert_allclose(
                    float(sv), np.percentile(v[m], q), atol=1e-4)


def test_masked_percentile_bitsearch_matches_numpy():
    """The batched bit-search percentile (production tracker path) must
    equal np.percentile exactly on integer-valued frames — every frame in
    the batch, tiny/empty masks included."""
    import jax.numpy as jnp
    from openglottal_tpu.ops.histogram import masked_percentile_u8_batch

    rng = np.random.default_rng(7)
    t = 12
    v = rng.integers(0, 256, (t, 16, 48)).astype(np.float32)
    m = np.stack([rng.random((16, 48)) < d
                  for d in np.linspace(0.0, 0.6, t)])
    m[1] = False                      # empty mask frame
    m[2] = False
    m[2, 3, 7] = True                 # single-pixel mask
    for q in (0.0, 5.0, 30.0, 50.0, 95.0, 100.0):
        vals, ns = masked_percentile_u8_batch(
            jnp.asarray(v), jnp.asarray(m), q)
        vals, ns = np.asarray(vals), np.asarray(ns)
        for i in range(t):
            assert int(ns[i]) == int(m[i].sum())
            if m[i].any():
                np.testing.assert_allclose(
                    vals[i], np.percentile(v[i][m[i]], q), atol=1e-4,
                    err_msg=f"frame {i} q {q}")
