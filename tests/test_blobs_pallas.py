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


from openglottal_tpu.ops.blobs_pallas import connected_components_pallas  # noqa: E402

RNG = np.random.default_rng(13)


@pytest.mark.parametrize("conn", [4, 8])
def test_pallas_matches_cv2(conn):
    """Full equivalence vs cv2: our label must be constant within each cv2
    component and distinct across components, and equal the component's min
    flat index (the kernel's id convention)."""
    for thresh in (0.5, 0.62, 0.75):
        m = cv2.GaussianBlur(RNG.random((256, 256)).astype(np.float32),
                             (21, 21), 5) > thresh
        got = np.asarray(connected_components_pallas(jnp.asarray(m), conn))
        n_cv, cvlab = cv2.connectedComponents(m.astype(np.uint8),
                                              connectivity=conn)
        flat_idx = np.arange(m.size).reshape(m.shape)
        for c in range(1, n_cv):
            comp = cvlab == c
            ours = np.unique(got[comp])
            assert len(ours) == 1
            assert ours[0] == flat_idx[comp].min()
