"""Windowed-tail yolo+unet fused graphs vs the full-frame forms.

With random-init weights the gate boxes exceed the 126-px window bound, so
the windowed graph's per-chunk ``lax.cond`` takes the full-frame branch —
which must be BIT-identical to the one-loop fused graph (unet_tail_full
composes to UNet.apply exactly).  With the in-repo trained demo weights the
boxes fit, the windowed branch engages, and areas must match up to the
conv-tiling reassociation tolerance documented at
_unet_windowed_areas_chunk_fn (boundary-pixel flips only).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglottal_tpu.data.synthetic import synthetic_video
from openglottal_tpu.models.unet import init_unet
from openglottal_tpu.models.yolo import init_yolo
from openglottal_tpu.pipelines import GlottalPipelines

WDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "weights")


def _rand_pipes():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uv = init_unet(k1, dtype=jnp.float32)
    _, yv = init_yolo(k2, dtype=jnp.float32)
    mk = lambda w: GlottalPipelines(unet_variables=uv, yolo_variables=yv,
                                    conf=0.0, dtype=jnp.float32,
                                    window_decoder=w)
    return mk(True), mk(False)


def test_fallback_bit_identical_to_unwindowed():
    pw, pf = _rand_pipes()
    assert pw._window and not pf._window
    gray = np.ascontiguousarray(
        synthetic_video(t=6, size=256, seed=4)[0][..., 0])
    aw = np.asarray(pw.yolo_unet_areas_gray(gray))
    af = np.asarray(pf.yolo_unet_areas_gray(gray))
    np.testing.assert_array_equal(aw, af)


def test_multi_matches_per_video_windowed():
    pw, _ = _rand_pipes()
    vids = [np.ascontiguousarray(
        synthetic_video(t=t, size=256, seed=s)[0][..., 0])
        for t, s in [(6, 1), (4, 2)]]
    multi = pw.yolo_unet_areas_gray_multi(vids)
    for g, m in zip(vids, multi):
        np.testing.assert_array_equal(
            np.asarray(pw.yolo_unet_areas_gray(g)), np.asarray(m))


@pytest.mark.skipif(not os.path.exists(os.path.join(WDIR, "demo_unet.npz")),
                    reason="demo weights absent")
def test_windowed_branch_engages_with_trained_weights():
    from openglottal_tpu.utils.io import load_unet_weights, load_yolo_weights

    uv = load_unet_weights(os.path.join(WDIR, "demo_unet.npz"))
    yv = load_yolo_weights(os.path.join(WDIR, "demo_yolo.npz"))
    mk = lambda w: GlottalPipelines(unet_variables=uv, yolo_variables=yv,
                                    dtype=jnp.float32, window_decoder=w)
    pw, pf = mk(True), mk(False)
    gray = np.ascontiguousarray(
        synthetic_video(t=8, size=256, seed=7, realistic=True)[0][..., 0])
    aw = np.asarray(pw.yolo_unet_areas_gray(gray))
    af = np.asarray(pf.yolo_unet_areas_gray(gray))
    # trained logits are steep at the glottis boundary; reassociation-class
    # flips are confined to |logit|~ulp pixels
    assert np.abs(aw - af).max() <= 2.0
    assert af.max() > 0  # the demo domain actually produces glottis areas
