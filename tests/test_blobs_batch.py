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
    top_n_blobs_batch_roi,
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


@pytest.mark.parametrize("n", [1, 2])
def test_windowed_roi_matches_full_frame(n):
    """top_n_blobs_batch_roi (the guided-vft 128²-window fast path) must be
    bit-identical to the full-frame pass for box-confined masks — including
    holes, boxes at every frame border, empty frames, and the in-graph
    fallback when a box exceeds the window."""
    h = w = 256
    rng = np.random.default_rng(11)
    boxes, masks = [], []
    # dense random content inside varied boxes (touching all four borders)
    for (x0, y0, x1, y1) in [(60, 60, 180, 150), (0, 0, 90, 70),
                             (200, 180, 256, 256), (0, 190, 60, 256),
                             (170, 0, 256, 80), (100, 100, 102, 103)]:
        m = np.zeros((h, w), bool)
        m[y0:y1, x0:x1] = rng.random((y1 - y0, x1 - x0)) < 0.55
        boxes.append([x0, y0, x1, y1])
        masks.append(m)
    # explicit nested-hole family: ring ⊃ hole ⊃ nested blob
    m = np.zeros((h, w), bool)
    m[20:80, 30:90] = True
    m[30:70, 40:80] = False     # hole
    m[45:55, 55:65] = True      # nested blob inside the hole
    m[85:95, 30:40] = True      # small rival comp
    boxes.append([28, 18, 97, 97])
    masks.append(m)
    # empty frame with a held box
    boxes.append([10, 10, 50, 50])
    masks.append(np.zeros((h, w), bool))
    masks = jnp.asarray(np.stack(masks))
    boxes_j = jnp.asarray(np.array(boxes, np.int32))
    got = np.asarray(top_n_blobs_batch_roi(masks, boxes_j, n))
    want = np.asarray(top_n_blobs_batch(masks, n))
    np.testing.assert_array_equal(got, want)

    # fallback: one frame's box exceeds win-2 -> whole batch takes the
    # full-frame branch, still exact
    big = np.zeros((h, w), bool)
    big[5:200, 5:230] = rng.random((195, 225)) < 0.5
    masks2 = jnp.asarray(np.stack([big, np.asarray(masks[0])]))
    boxes2 = jnp.asarray(np.array([[5, 5, 230, 200], boxes[0]], np.int32))
    got2 = np.asarray(top_n_blobs_batch_roi(masks2, boxes2, n))
    want2 = np.asarray(top_n_blobs_batch(masks2, n))
    np.testing.assert_array_equal(got2, want2)


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
