"""Batched blob ops must match per-frame ops exactly (the frame-parallel
trackers route through top_n_blobs_batch / largest_blob_batch)."""

import numpy as np
import jax.numpy as jnp
import pytest

from openglottal_tpu.ops.blobs import (
    largest_blob,
    largest_blob_batch,
    top_n_blobs,
    top_n_blobs_batch,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("n", [1, 2])
def test_batch_matches_per_frame(n):
    t, h, w = 6, 40, 52  # non-tileable on purpose (exercises padding)
    masks = np.stack([
        RNG.random((h, w)) < p for p in (0.2, 0.45, 0.55, 0.7, 0.0, 1.0)
    ])
    got = np.asarray(top_n_blobs_batch(jnp.asarray(masks), n))
    for i in range(t):
        want = np.asarray(top_n_blobs(jnp.asarray(masks[i]), n))
        np.testing.assert_array_equal(got[i], want, err_msg=f"frame {i}")


def test_largest_blob_batch_matches():
    masks = RNG.random((5, 64, 64)) < 0.5
    got = np.asarray(largest_blob_batch(jnp.asarray(masks)))
    for i in range(5):
        np.testing.assert_array_equal(
            got[i], np.asarray(largest_blob(jnp.asarray(masks[i]))))


def test_huge_blob_not_dropped():
    """Regression: the old packed int32 ranking key size*(hw+1)+(hw-1-label)
    overflowed once a blob exceeded 32767 px on a 256² frame, silently
    dropping/misranking the biggest blobs (the production vft_parallel ROI
    path feeds frames this large)."""
    h = w = 256
    masks = np.zeros((2, h, w), bool)
    masks[0, 8:248, 8:248] = True           # 57,600-px blob (> 2^31/(hw+1))
    masks[1, 0:200, 0:250] = True           # 50,000-px blob + a small rival
    masks[1, 230:240, 10:30] = True
    got = np.asarray(top_n_blobs_batch(jnp.asarray(masks), 1))
    assert got[0].sum() == 240 * 240
    np.testing.assert_array_equal(got[0], masks[0])
    assert got[1].sum() == 200 * 250
    for i in range(2):
        want = np.asarray(top_n_blobs(jnp.asarray(masks[i]), 1))
        np.testing.assert_array_equal(got[i], want, err_msg=f"frame {i}")
