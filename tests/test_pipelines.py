"""End-to-end pipeline behavior on synthetic videos (untrained weights;
checks plumbing, shapes, reference edge-case semantics, and consistency
between the fused fast path and the modular path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglottal_tpu.data.synthetic import synthetic_video
from openglottal_tpu.data.video import bgr_to_gray_u8
from openglottal_tpu.models.unet import init_unet
from openglottal_tpu.models.yolo import init_yolo
from openglottal_tpu.pipelines import (VFT_INIT, GlottalPipelines,
                                        is_monochrome)


@pytest.fixture(scope="module")
def pipe():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uv = init_unet(k1, dtype=jnp.float32)
    _, yv = init_yolo(k2, dtype=jnp.float32)
    return GlottalPipelines(unet_variables=uv, crop_unet_variables=uv,
                            yolo_variables=yv, conf=0.0, dtype=jnp.float32)


@pytest.fixture(scope="module")
def video():
    return synthetic_video(t=12, size=256, seed=5)[0]


def test_monochrome_detection(video):
    assert is_monochrome(video)
    color = video.copy()
    color[0, 0, 0, 0] ^= 255
    assert not is_monochrome(color)


def test_fused_path_matches_modular(pipe, video):
    gray = np.asarray(bgr_to_gray_u8(video))
    fused = np.asarray(pipe.yolo_unet_areas_gray(gray))
    # modular path: segment + gate + box sums with the BGR input
    from openglottal_tpu.pipelines import _box_area_sums

    fdev = jax.device_put(video)
    masks = pipe.segment_video(jax.device_put(gray))
    valid, boxes = pipe._gated(fdev, None)
    modular = np.asarray(_box_area_sums(masks, valid, boxes))
    np.testing.assert_allclose(fused, modular, atol=0.5)


def test_extract_features_all_pipelines(pipe, video):
    for p in ["unet-only", "unet", "crop-unet", "guided-vft", "vft"]:
        feats = pipe.extract_features(video, p)
        assert feats is None or "area_mean" in feats, p


def test_empty_and_short_video(pipe, video):
    assert pipe.extract_features(np.zeros((0, 256, 256, 3), np.uint8),
                                 "unet-only") is None
    assert pipe.extract_features(video[:5], "vft") is None  # < init+5


def test_no_detection_silent(pipe, video):
    hi = GlottalPipelines(unet_variables=pipe.unet_variables,
                          yolo_variables=pipe.yolo_variables,
                          conf=1.1, dtype=jnp.float32)
    assert hi.extract_features(video, "unet") is None


@pytest.mark.parametrize(
    "pipeline", ["unet-only", "unet", "crop-unet", "guided-vft", "vft"])
def test_run_pipeline_full_all_branches(pipe, video, pipeline):
    """Every branch of run_pipeline_full must execute (round-1 shipped a
    NameError in the crop-unet branch because only 'unet' was tested)."""
    masks, valid, boxes, areas = pipe.run_pipeline_full(video, pipeline)
    t = len(video)
    assert masks.shape == (t, 256, 256), pipeline
    assert areas.shape == (t,), pipeline
    if pipeline == "unet-only":
        assert valid is None and boxes is None
    else:
        assert valid.shape == (t,) and boxes.shape == (t, 4)
    # areas must be consistent with the masks the caller will overlay
    m_areas = np.asarray(masks).sum((1, 2)).astype(np.float32)
    if pipeline in ("unet-only", "crop-unet", "guided-vft"):
        np.testing.assert_allclose(np.asarray(areas), m_areas, atol=0.5)


def test_run_pipeline_full_unknown_raises(pipe, video):
    with pytest.raises(ValueError):
        pipe.run_pipeline_full(video, "nope")


@pytest.mark.parametrize("color", [False, True])
def test_gated_non_256_matches_host_oracle(pipe, color):
    """The letterbox->detect->unproject branch of _gated (non-256² videos)
    against an oracle composed from the individually-pinned pieces:
    host letterbox (ops/resize), the 256² detector path, explicit box
    unprojection, and gate_scan."""
    from openglottal_tpu.models.gate import gate_scan
    from openglottal_tpu.ops.resize import letterbox, letterbox_info

    t, h, w = 6, 300, 200
    rng = np.random.default_rng(3)
    vid = (rng.random((t, h, w, 3)) * 255).astype(np.uint8)
    if not color:
        vid = np.repeat(vid[..., :1], 3, axis=-1)
    fdev, gray = pipe.prepare(vid)
    assert (fdev is None) == (not color)
    got_v, got_b = pipe._gated(fdev, gray)

    # oracle: letterbox each channel/gray on host, detect at 256², then
    # unproject boxes through the letterbox geometry and run the gate
    pt, pl, _, _ = letterbox_info(h, w, 256)
    scale = max(h, w) / 256.0
    if color:
        boxed = np.stack([
            np.asarray(letterbox(jnp.asarray(vid[..., c], jnp.float32), 256,
                                 method="linear")) for c in range(3)], -1)
        boxed = np.clip(np.round(boxed), 0, 255).astype(np.uint8)
        has, raw, _ = pipe.detect_video(boxed)
    else:
        boxed = np.asarray(letterbox(jnp.asarray(gray, jnp.float32), 256,
                                     method="linear"))
        boxed = np.clip(np.round(boxed), 0, 255).astype(np.uint8)
        has, raw, _ = pipe.detect_video_gray(boxed)
    raw = np.asarray(raw)
    un = np.stack([(raw[:, 0] - pl) * scale, (raw[:, 1] - pt) * scale,
                   (raw[:, 2] - pl) * scale, (raw[:, 3] - pt) * scale], -1)
    un = np.clip(un, 0, np.asarray([w, h, w, h], np.float32))
    want_v, want_b = gate_scan(jnp.asarray(has), jnp.asarray(un), h, w,
                               params=pipe.gate_params)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))


def test_multi_video_fused_matches_per_video(pipe, video):
    """yolo_unet_areas_gray_multi (one dispatch for a whole batch — the
    cohort-serving form) vs per-video yolo_unet_areas_gray: bit-identical
    per video, including different lengths within one batch (per-video
    t_real masking + causal per-video gate scans)."""
    g1 = np.asarray(bgr_to_gray_u8(video))
    g2 = np.asarray(bgr_to_gray_u8(synthetic_video(t=7, size=256, seed=9)[0]))
    multi = pipe.yolo_unet_areas_gray_multi([g1, g2])
    assert [len(m) for m in multi] == [len(g1), len(g2)]
    for g, m in zip((g1, g2), multi):
        np.testing.assert_array_equal(
            np.asarray(pipe.yolo_unet_areas_gray(g)), m)
    assert pipe.yolo_unet_areas_gray_multi([]) == []


def test_multi_video_subbatch_and_fetch_false(pipe, video, monkeypatch):
    """The dispatch-ahead serving protocol (VERDICT r4 item 2): cohorts
    above MAX_COHORT_K split into sub-batches, all dispatched before the
    first fetch; ``fetch=False`` returns per-video DEVICE arrays whose
    values are bit-identical to the fetched form."""
    import openglottal_tpu.pipelines as P

    g1 = np.asarray(bgr_to_gray_u8(video))
    g2 = np.asarray(bgr_to_gray_u8(synthetic_video(t=7, size=256, seed=9)[0]))
    g3 = np.asarray(bgr_to_gray_u8(synthetic_video(t=9, size=256, seed=11)[0]))
    want = [np.asarray(pipe.yolo_unet_areas_gray(g)) for g in (g1, g2, g3)]

    monkeypatch.setattr(P, "MAX_COHORT_K", 2)  # force [g1,g2] + [g3] split
    got = pipe.yolo_unet_areas_gray_multi([g1, g2, g3])
    for w, g in zip(want, got):
        assert isinstance(g, np.ndarray)
        np.testing.assert_array_equal(w, g)

    lazy = pipe.yolo_unet_areas_gray_multi([g1, g2, g3], fetch=False)
    for w, g in zip(want, lazy):
        assert isinstance(g, jax.Array)  # still on device
        np.testing.assert_array_equal(w, np.asarray(g))


def test_vft_multi_subbatch(pipe, video, monkeypatch):
    """vft_areas_gray_multi's MAX_COHORT_K sub-batching (detect+gate cohort
    graph per sub-batch) stays bit-identical to per-video."""
    import openglottal_tpu.pipelines as P

    g1 = np.asarray(bgr_to_gray_u8(video))
    g2 = np.asarray(bgr_to_gray_u8(synthetic_video(t=9, size=256, seed=9)[0]))
    monkeypatch.setattr(P, "MAX_COHORT_K", 1)
    multi = pipe.vft_areas_gray_multi([g1, g2])
    for g, m in zip((g1, g2), multi):
        np.testing.assert_array_equal(np.asarray(pipe.vft_areas_gray(g)), m)


def test_guided_vft_multi_matches_per_video(pipe, video):
    """guided_vft_areas_gray_multi (one fused dispatch for a whole cohort:
    shared detection chunks, vmapped gate scans + tracker init/threshold
    chains, flattened per-frame tracker tail) vs per-video
    guided_vft_areas_gray: bit-identical per video across mixed lengths;
    too-short videos yield None (same contract as the per-video call)."""
    g1 = np.asarray(bgr_to_gray_u8(video))
    g2 = np.asarray(bgr_to_gray_u8(synthetic_video(t=7, size=256, seed=9)[0]))
    short = g1[:3]  # < YGVFT_INIT + 2
    multi = pipe.guided_vft_areas_gray_multi([g1, short, g2])
    assert multi[1] is None
    for g, m in zip((g1, g2), (multi[0], multi[2])):
        np.testing.assert_array_equal(
            np.asarray(pipe.guided_vft_areas_gray(g)), m)
    assert pipe.guided_vft_areas_gray_multi([]) == []


def test_vft_multi_matches_per_video(pipe, video):
    """vft_areas_gray_multi (one fused detect+gate dispatch for the cohort,
    per-video tracker passes) vs per-video vft_areas_gray: bit-identical;
    too-short videos yield None."""
    g1 = np.asarray(bgr_to_gray_u8(video))
    g2 = np.asarray(bgr_to_gray_u8(synthetic_video(t=9, size=256, seed=9)[0]))
    short = g1[:VFT_INIT + 3]  # < VFT_INIT + 5
    multi = pipe.vft_areas_gray_multi([g1, short, g2])
    assert multi[1] is None
    for g, m in zip((g1, g2), (multi[0], multi[2])):
        np.testing.assert_array_equal(np.asarray(pipe.vft_areas_gray(g)), m)
    assert pipe.vft_areas_gray_multi([]) == []


def test_gated_fused_matches_modular(pipe, video):
    """_gated's monochrome fast path (_fused_gated_video — detect + gate as
    ONE dispatch) vs the modular detect_video_gray + gate_scan form:
    bit-identical on the real-frame prefix (identical per-chunk detection
    graph; the gate scan is causal, so the padded tail cannot reach back)."""
    from openglottal_tpu.models.gate import gate_scan

    gray = jax.device_put(np.asarray(bgr_to_gray_u8(video)))
    got_v, got_b = pipe._gated(None, gray)
    has, raw, _ = pipe.detect_video_gray(gray)
    want_v, want_b = gate_scan(has, raw, 256, 256, params=pipe.gate_params)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))


def test_fused_ygvft_matches_two_dispatch(pipe, video):
    """guided_vft_areas_gray's single-dispatch fused graph vs the modular
    _gated + _ygvft_compute form: bit-identical (the YOLO chunks see the
    same 128-frame padded batches, the gate scan is causal, the tracker's
    dead lmap prefix is DCE'd, and the thresh chain is a sequential scan)."""
    gray = np.asarray(bgr_to_gray_u8(video))
    t = len(video)
    fused = pipe.guided_vft_areas_gray(gray)
    gdev = jax.device_put(gray)
    valid, boxes = pipe._gated(None, gdev)
    modular, _ = pipe._ygvft_compute(gdev, valid, boxes, t)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(modular))


def test_vft_areas_gray_matches_bgr(pipe, video):
    """vft_areas_gray(gray) == vft_areas(monochrome bgr video)."""
    gray = np.asarray(bgr_to_gray_u8(video))
    a = pipe.vft_areas_gray(gray)
    b = pipe.vft_areas(video)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tracker_routing_parallel_matches_scan(pipe, video):
    """Production paths route through the frame-parallel trackers; the
    sequential-scan fallback must agree (float-reassociation tolerance)."""
    seq = GlottalPipelines(
        unet_variables=pipe.unet_variables,
        crop_unet_variables=pipe.crop_unet_variables,
        yolo_variables=pipe.yolo_variables, conf=0.0, dtype=jnp.float32,
        parallel_trackers=False)
    assert pipe.parallel_trackers and not seq.parallel_trackers
    for p in ["vft", "guided-vft"]:
        a_par = pipe.run_pipeline_full(video, p)[3]
        a_seq = seq.run_pipeline_full(video, p)[3]
        np.testing.assert_allclose(np.asarray(a_par), np.asarray(a_seq),
                                   atol=2.0, err_msg=p)


def test_jit_hot_cpu_path_and_lower():
    """_jit_hot resolves per backend at call time: on the CPU test backend it
    must run the plain-jit variant (the TPU compiler option would be
    rejected), and .lower must delegate (bench.py cost analysis relies on
    it)."""
    import jax.numpy as jnp

    from openglottal_tpu.pipelines import _jit_hot, _unet_chunk

    @_jit_hot(static_argnames=("k",))
    def f(x, k: int = 2):
        return x * k

    out = f(jnp.arange(4.0), k=3)
    np.testing.assert_allclose(np.asarray(out), [0, 3, 6, 9])
    lowered = f.lower(jnp.arange(4.0), k=3)
    assert "flops" in (lowered.compile().cost_analysis() or {"flops": 0})
    # the real hot fn exposes .lower too
    assert hasattr(_unet_chunk, "lower")
