"""Resize/letterbox ops vs OpenCV oracle."""

import cv2
import numpy as np
import pytest

from openglottal_tpu.ops import (
    resize_bilinear,
    resize_nearest,
    crop_resize_bilinear,
    letterbox,
    unletterbox,
)
from openglottal_tpu.ops.resize import letterbox_info, letterbox_np

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("shape,out", [
    ((256, 256), (256, 256)),
    ((120, 200), (256, 256)),
    ((512, 384), (256, 256)),
    ((256, 256), (100, 180)),
    ((37, 61), (256, 256)),
])
def test_bilinear_matches_cv2(shape, out):
    img = RNG.random(shape).astype(np.float32) * 255
    want = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(img, *out))
    np.testing.assert_allclose(got, want, atol=1e-2)


@pytest.mark.parametrize("shape,out", [
    ((256, 256), (100, 180)),
    ((120, 200), (256, 256)),
    ((37, 61), (13, 29)),
])
def test_nearest_matches_cv2(shape, out):
    img = (RNG.random(shape) * 255).astype(np.uint8)
    want = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(resize_nearest(img.astype(np.float32), *out))
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_bilinear_batched():
    imgs = RNG.random((5, 120, 200)).astype(np.float32)
    got = np.asarray(resize_bilinear(imgs, 256, 256))
    for i in range(5):
        want = cv2.resize(imgs[i], (256, 256), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(got[i], want, atol=1e-2)


def test_crop_resize_matches_cv2_crop_then_resize():
    img = RNG.random((256, 256)).astype(np.float32) * 255
    y1, x1, ch, cw = 40, 65, 90, 70
    want = cv2.resize(img[y1:y1 + ch, x1:x1 + cw], (256, 256),
                      interpolation=cv2.INTER_LINEAR)
    got = np.asarray(crop_resize_bilinear(img, y1, x1, ch, cw, 256, 256))
    np.testing.assert_allclose(got, want, atol=1e-2)


@pytest.mark.parametrize("shape", [(120, 200), (512, 384), (256, 256), (300, 100)])
def test_letterbox_matches_reference_geometry(shape):
    img = (RNG.random(shape) * 255).astype(np.uint8)
    # reference letterbox uses INTER_NEAREST for 2-D arrays (utils.py:80)
    want = letterbox_np(img, 256)
    got = np.asarray(letterbox(img.astype(np.float32), 256, method="nearest"))
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_unletterbox_roundtrip():
    # smooth elliptical mask (glottis-like): roundtrip errors only at boundary
    yy, xx = np.mgrid[:300, :180]
    msk = ((((yy - 150) / 80.0) ** 2 + ((xx - 90) / 30.0) ** 2) < 1).astype(np.float32)
    pt, pl, ch, cw = letterbox_info(300, 180, 256)
    boxed = np.asarray(letterbox(msk, 256, method="nearest"))
    back = np.asarray(unletterbox(boxed, pt, pl, ch, cw, 300, 180, method="nearest"))
    assert back.shape == (300, 180)
    assert np.mean((back > 0.5) == (msk > 0.5)) > 0.99
