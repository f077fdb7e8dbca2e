"""int8 U-Net split forward + box-windowed decoder.

On the CPU lowering the windowed form is BIT-identical to the monolithic
int8 pass (pinned below).  On TPU the bf16 upsample epilogue retiles per
shape and flips near-zero logits — the same divergence class as the bf16
windowed path, measured equidistant-small and bounded by the selftest
windowed_rel_l1 gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglottal_tpu.models.fold import fold_batchnorm
from openglottal_tpu.models.quant import (
    quantize_unet,
    qunet_masks,
    qunet_tail_from_d3_full,
    qunet_tail_from_d3_window,
    qunet_to_d3,
)
from openglottal_tpu.models.unet import init_unet


@pytest.fixture(scope="module")
def qp_and_frames():
    _, v = init_unet(jax.random.PRNGKey(0), dtype=jnp.float32, size=256)
    folded = fold_batchnorm(v, 1e-5)
    rng = np.random.default_rng(7)
    calib = (rng.random((8, 256, 256)) * 255).astype(np.uint8)
    qp = quantize_unet(folded, calib)
    frames = (rng.random((2, 256, 256)) * 255).astype(np.uint8)
    return qp, jnp.asarray(frames)


def test_d3_split_composes_to_qunet_masks(qp_and_frames):
    qp, g = qp_and_frames
    want = np.asarray(qunet_masks(qp, g))
    x8, skip1, skip2 = qunet_to_d3(qp, g)
    assert x8.shape == (2, 64, 64, 128) and x8.dtype == jnp.int8
    assert skip1.shape == (2, 256, 256, 32) and skip2.shape == (2, 128, 128, 64)
    logits = qunet_tail_from_d3_full(qp, x8, skip1, skip2)
    np.testing.assert_array_equal(np.asarray(logits > 0), want)


def test_quant_pipeline_windowed_matches_full():
    """int8 GlottalPipelines with the windowed decoder (auto-on) equals the
    window_decoder=False form: random-init boxes exceed the window, the
    speculation flag comes back False, and the redo routes through the full
    quantized graph — exercising the whole spec/redo plumbing."""
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import GlottalPipelines

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    _, uv = init_unet(k1, dtype=jnp.float32)
    _, yv = init_yolo(k2, dtype=jnp.float32)
    gray = np.ascontiguousarray(
        synthetic_video(t=4, size=256, seed=9)[0][..., 0])
    mk = lambda w: GlottalPipelines(unet_variables=uv, yolo_variables=yv,
                                    conf=0.0, dtype=jnp.float32,
                                    quant="int8", window_decoder=w)
    pw, pf = mk(None), mk(False)
    assert pw._window and not pf._window
    pw.calibrate(gray)
    pf._qparams = pw._qparams  # identical calibration
    aw = np.asarray(pw.yolo_unet_areas_gray(gray))
    af = np.asarray(pf.yolo_unet_areas_gray(gray))
    np.testing.assert_array_equal(aw, af)
    # cohort form agrees with per-video
    multi = pw.yolo_unet_areas_gray_multi([gray, gray[:3]])
    np.testing.assert_array_equal(np.asarray(multi[0]), aw)


@pytest.mark.parametrize("origin", [(66, 38), (6, 6), (90, 90), (6, 90)])
def test_windowed_tail_bit_equal(qp_and_frames, origin):
    qp, g = qp_and_frames
    oy, ox = origin
    x8, skip1, skip2 = qunet_to_d3(qp, g)
    full = np.asarray(qunet_tail_from_d3_full(qp, x8, skip1, skip2))
    win = np.asarray(qunet_tail_from_d3_window(
        qp, x8, skip1, skip2, jnp.int32(oy), jnp.int32(ox), 160))
    np.testing.assert_array_equal(win, full[:, oy:oy + 160, ox:ox + 160])
