"""Connected components / top-n blob filter.

Oracle: an independent numpy/cv2 flood-fill implementation of the kernel's
*topological* semantics — filled(X) = pixels separated from the border by
component X alone (holes + nested comps absorbed, pockets and open bays
excluded).  cv2's drawContours(FILLED) additionally paints bays reachable
only through 1-px-wide channels (a fillPoly rasterization artifact); that
divergence is documented in ops/blobs.py and pinned by the structured tests
below.
"""

import cv2
import numpy as np
import pytest

from openglottal_tpu.ops import connected_components, top_n_blobs
from openglottal_tpu.ops.blobs import fill_holes, largest_blob

RNG = np.random.default_rng(2)


def _flood_outside(obstacle):
    """Background region 4-reachable from the border avoiding ``obstacle``."""
    h, w = obstacle.shape
    free = (~obstacle).astype(np.uint8)
    pad = np.zeros((h + 2, w + 2), np.uint8)
    pad[1:-1, 1:-1] = free
    pad[0, :] = pad[-1, :] = pad[:, 0] = pad[:, -1] = 1
    ff_mask = np.zeros((h + 4, w + 4), np.uint8)
    cv2.floodFill(pad, ff_mask, (0, 0), 2)
    return pad[1:-1, 1:-1] == 2


def _oracle_top_n(mask, n):
    """Topological top-n: filled(X) = ~reachable-from-border when only X
    blocks; X is absorbed (not a candidate) iff it lies inside some other
    component's filled region; rank candidates by foreground count of their
    filled region; output = union of the top-n filled regions."""
    num, lab = cv2.connectedComponents(mask.astype(np.uint8), connectivity=8)
    filled = {x: ~_flood_outside(lab == x) for x in range(1, num)}
    absorbed = set()
    for x in range(1, num):
        for y in range(1, num):
            if x != y and (filled[y][lab == x]).all():
                absorbed.add(x)
                break
    cands = sorted(
        ((int((filled[x] & mask).sum()), x) for x in range(1, num)
         if x not in absorbed),
        key=lambda r: -r[0],
    )
    out = np.zeros_like(mask)
    for cnt, x in cands[:n]:
        if cnt > 0:
            out |= filled[x]
    return out


def _random_blobs(shape=(128, 128), thresh=0.75):
    noise = RNG.random(shape).astype(np.float32)
    sm = cv2.GaussianBlur(noise, (21, 21), 5)
    return (sm > np.quantile(sm, thresh)).astype(np.uint8) * 255


def test_cc_counts_match_cv2():
    for _ in range(5):
        m = _random_blobs()
        n_cv, _ = cv2.connectedComponents(m, connectivity=8)
        lab = np.asarray(connected_components(m > 0))
        ours = len(np.unique(lab[m > 0]))
        assert ours == n_cv - 1  # cv2 counts background


@pytest.mark.parametrize("n", [1, 2, 3])
def test_top_n_blobs_matches_oracle(n):
    for _ in range(4):
        m = _random_blobs() > 0
        want = _oracle_top_n(m, n)
        got = np.asarray(top_n_blobs(m, n))
        np.testing.assert_array_equal(got, want)


def test_nested_blob_absorbed():
    """Ring with a nested blob in its hole: FILLED paints everything
    (cv2 RETR_EXTERNAL never lists the nested comp)."""
    m = np.zeros((32, 32), bool)
    m[4:28, 4:28] = True
    m[8:24, 8:24] = False
    m[12:20, 12:20] = True
    got = np.asarray(top_n_blobs(m, 1))
    assert got[15, 15] and got[9, 9] and got[5, 5]
    assert not got[0, 0]
    # matches cv2 exactly here
    cs, _ = cv2.findContours(m.astype(np.uint8) * 255, cv2.RETR_EXTERNAL,
                             cv2.CHAIN_APPROX_SIMPLE)
    want = np.zeros((32, 32), np.uint8)
    cv2.drawContours(want, [max(cs, key=cv2.contourArea)], -1, 255, cv2.FILLED)
    np.testing.assert_array_equal(got, want > 0)


def test_pocket_not_filled():
    """Background pocket jointly enclosed by two blobs stays black."""
    m = np.zeros((32, 32), bool)
    m[4:16, 4:28] = True    # top bar
    m[18:30, 4:28] = True   # bottom bar — gap rows 16:18 form an open channel
    # close left and right with the SAME two bars would merge; use 2 separate side bars
    m2 = np.zeros((32, 32), bool)
    m2[4:8, 4:28] = True
    m2[24:28, 4:28] = True
    m2[9:23, 4:8] = True
    m2[9:23, 24:28] = True  # 4 bars with 1-px diagonal gaps at corners -> pocket
    got = np.asarray(top_n_blobs(m2, 4))
    assert not got[15, 15]  # pocket centre stays unfilled
    assert got[5, 15]


def test_fill_holes():
    m = np.zeros((64, 64), bool)
    m[10:50, 10:50] = True
    m[25:35, 25:35] = False  # hole
    filled = np.asarray(fill_holes(m))
    assert filled[30, 30]
    assert not filled[5, 5]


def test_largest_blob_empty():
    m = np.zeros((32, 32), bool)
    assert not np.asarray(largest_blob(m)).any()


def test_spiral_converges():
    """Worst case for label propagation: a long spiral blob."""
    m = np.zeros((96, 96), np.uint8)
    x1, y1, x2, y2 = 4, 4, 91, 91
    while x2 - x1 > 8:
        cv2.rectangle(m, (x1, y1), (x2, y2), 255, 2)
        m[y1:y1 + 2, x1:x1 + 8] = 0
        x1 += 6; y1 += 6; x2 -= 6; y2 -= 6
    lab = np.asarray(connected_components(m > 0))
    n_cv, _ = cv2.connectedComponents(m, connectivity=8)
    assert len(np.unique(lab[m > 0])) == n_cv - 1
