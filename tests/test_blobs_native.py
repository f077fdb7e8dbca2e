"""Native host blob library vs the device kernel (bit-identical semantics)."""

import cv2
import numpy as np
import pytest

from openglottal_tpu.ops import top_n_blobs, connected_components

native = pytest.importorskip("openglottal_tpu.ops.blobs_native")

RNG = np.random.default_rng(9)


def _random_blobs(shape=(128, 128), thresh=0.75):
    noise = RNG.random(shape).astype(np.float32)
    sm = cv2.GaussianBlur(noise, (21, 21), 5)
    return sm > np.quantile(sm, thresh)


def test_native_builds_and_matches_device_cc():
    for _ in range(3):
        m = _random_blobs()
        host = native.connected_components_host(m)
        dev = np.asarray(connected_components(m))
        np.testing.assert_array_equal(host, dev)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_native_top_n_matches_device(n):
    for _ in range(3):
        m = _random_blobs()
        host = native.top_n_blobs_host(m, n)
        dev = np.asarray(top_n_blobs(m, n))
        np.testing.assert_array_equal(host, dev)


def test_native_percentile():
    vals = (RNG.random((50, 60)) * 255).astype(np.uint8)
    mask = RNG.random((50, 60)) > 0.5
    want = np.percentile(vals[mask], 30.0)
    got = native.masked_percentile_u8_host(vals, mask, 30.0, 0.0)
    assert abs(got - want) < 1e-9
