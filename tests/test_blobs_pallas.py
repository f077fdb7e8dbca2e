"""Pallas CC kernel vs the XLA propagation (TPU only — skipped on the CPU
test mesh; exercised on hardware by bench/selftest and run manually via
`JAX_PLATFORMS= python -m pytest tests/test_blobs_pallas.py`)."""

import cv2
import numpy as np
import pytest

import jax

if jax.default_backend() == "cpu":
    pytest.skip("Pallas TPU kernel — needs TPU backend", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402


from openglottal_tpu.ops.blobs_pallas import (  # noqa: E402
    connected_components_pallas,
    connected_components_pallas_batch,
    dual_cc_pallas_batch,
    dual_min_prop_pallas_batch,
    min_prop_pallas_batch,
)

RNG = np.random.default_rng(13)


def _assert_matches_cv2(m, conn):
    got = np.asarray(connected_components_pallas(jnp.asarray(m), conn))
    n_cv, cvlab = cv2.connectedComponents(m.astype(np.uint8),
                                          connectivity=conn)
    flat_idx = np.arange(m.size).reshape(m.shape)
    for c in range(1, n_cv):
        comp = cvlab == c
        ours = np.unique(got[comp])
        assert len(ours) == 1
        assert ours[0] == flat_idx[comp].min()
    assert (got[~m] == m.size).all()


@pytest.mark.parametrize("conn", [4, 8])
def test_pallas_matches_cv2(conn):
    """Full equivalence vs cv2: our label must be constant within each cv2
    component and distinct across components, and equal the component's min
    flat index (the kernel's id convention)."""
    for thresh in (0.5, 0.62, 0.75):
        m = cv2.GaussianBlur(RNG.random((256, 256)).astype(np.float32),
                             (21, 21), 5) > thresh
        _assert_matches_cv2(m, conn)


@pytest.mark.parametrize("conn", [4, 8])
def test_pallas_percolation_noise(conn):
    """Percolation-regime noise — the motion trackers' absdiff-threshold
    masks look like this; the segmented-scan sweeps must stay fast AND exact
    (thousands of tiny comps at p=0.4, giant spanning comps at p=0.7)."""
    for p in (0.4, 0.55, 0.7):
        _assert_matches_cv2(RNG.random((256, 256)) < p, conn)


@pytest.mark.parametrize("conn", [4, 8])
def test_pallas_worst_case_paths(conn):
    """Geodesically worst-case shapes: spiral arms and 1-px serpentine
    channels (maximal direction changes per unit area)."""
    m = np.zeros((256, 256), bool)
    x0, y0, x1, y1 = 0, 0, 255, 255
    while x0 < x1:
        m[y0, x0:x1 + 1] = True
        m[y0:y1 + 1, x1] = True
        m[y1, x0:x1 + 1] = True
        m[y0 + 2:y1 + 1, x0] = True
        x0 += 4; y0 += 4; x1 -= 4; y1 -= 4
    _assert_matches_cv2(m, conn)

    m = np.ones((256, 256), bool)
    for r in range(1, 256, 2):
        m[r, :] = False
        m[r, 0 if (r // 2) % 2 else 255] = True
    _assert_matches_cv2(m, conn)


@pytest.mark.parametrize("conn", [4, 8])
@pytest.mark.parametrize("hw", [(136, 256), (256, 256)])
def test_pallas_batch_matches_single(conn, hw):
    """The grouped-frames kernel must label each frame exactly like the
    single-mask kernel (frame walls airtight, incl. percolation noise that
    would merge across frames if a roll leaked)."""
    h, w = hw
    masks = np.stack([RNG.random((h, w)) < p
                      for p in (0.3, 0.45, 0.55, 0.65, 0.0, 1.0, 0.5, 0.5)])
    got = np.asarray(connected_components_pallas_batch(jnp.asarray(masks), conn))
    for i in range(masks.shape[0]):
        want = np.asarray(connected_components_pallas(jnp.asarray(masks[i]), conn))
        np.testing.assert_array_equal(got[i], want, err_msg=f"frame {i}")


@pytest.mark.parametrize("conn", [4, 8])
def test_pallas_min_prop_broadcasts_root_value(conn):
    """min_prop with a value seeded at each component's root (H*W elsewhere)
    must broadcast that value over the whole component and nothing else —
    the primitive behind the gather-free top-n selection (ops/blobs)."""
    h, w = 136, 256
    masks = np.stack([RNG.random((h, w)) < p for p in (0.35, 0.55, 0.7, 1.0)])
    t = masks.shape[0]
    labs = np.asarray(connected_components_pallas_batch(jnp.asarray(masks), conn))
    idx = np.arange(h * w).reshape(1, h, w)
    vals = RNG.integers(0, 1000, (t, h, w)).astype(np.int32)
    init = np.where(masks & (labs == idx), vals, h * w).astype(np.int32)
    got = np.asarray(min_prop_pallas_batch(jnp.asarray(masks),
                                           jnp.asarray(init), conn))
    # expected: every pixel gets its root's value (root = pixel whose flat
    # index equals the component label)
    want = np.full((t, h, w), h * w, np.int32)
    for i in range(t):
        roots = vals[i].reshape(-1)[labs[i][masks[i]]]
        want[i][masks[i]] = roots
    np.testing.assert_array_equal(got, want)


def _dual_fixture():
    """Mask/background pairs covering percolation noise, blurred blobs, and
    the all-one / all-zero degenerate frames."""
    h, w = 136, 256
    frames = [RNG.random((h, w)) < p for p in (0.35, 0.5, 0.65, 0.0, 1.0)]
    frames.append(cv2.GaussianBlur(RNG.random((h, w)).astype(np.float32),
                                   (21, 21), 5) > 0.6)
    masks = np.stack(frames)
    code = np.where(masks, 1, 2).astype(np.int32)
    return masks, code


def test_dual_cc_matches_two_singles():
    """One dual-region fixpoint == mask CC (8-conn) + background CC (4-conn)
    run separately: values must not leak across the region boundary."""
    masks, code = _dual_fixture()
    got = np.asarray(dual_cc_pallas_batch(jnp.asarray(code)))
    labF = np.asarray(connected_components_pallas_batch(jnp.asarray(masks), 8))
    labB = np.asarray(connected_components_pallas_batch(jnp.asarray(~masks), 4))
    np.testing.assert_array_equal(np.where(masks, got, labF), labF)
    np.testing.assert_array_equal(np.where(~masks, got, labB), labB)


def test_dual_min_prop_matches_two_singles():
    masks, code = _dual_fixture()
    t, h, w = masks.shape
    init = RNG.integers(0, h * w, (t, h, w)).astype(np.int32)
    got = np.asarray(dual_min_prop_pallas_batch(jnp.asarray(code),
                                                jnp.asarray(init)))
    pf = np.asarray(min_prop_pallas_batch(jnp.asarray(masks),
                                          jnp.asarray(init), 8))
    pb = np.asarray(min_prop_pallas_batch(jnp.asarray(~masks),
                                          jnp.asarray(init), 4))
    np.testing.assert_array_equal(np.where(masks, got, pf), pf)
    np.testing.assert_array_equal(np.where(~masks, got, pb), pb)
