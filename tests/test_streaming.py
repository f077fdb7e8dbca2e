"""Streaming (bounded-memory) pipelines: chunked processing with a carried
gate state must be bit-identical to the whole-video batched paths."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openglottal_tpu.data.synthetic import synthetic_video
from openglottal_tpu.models.gate import gate_init, gate_scan, gate_scan_carry
from openglottal_tpu.models.unet import init_unet
from openglottal_tpu.models.yolo import init_yolo
from openglottal_tpu.pipelines import GlottalPipelines

RNG = np.random.default_rng(11)


def test_gate_scan_carry_chunked_matches_full():
    """Chunked gate runs (carry handed across segment boundaries) must equal
    one scan over the concatenation — including hold/zero transitions that
    straddle a boundary."""
    t = 97
    has = jnp.asarray(RNG.random(t) < 0.6)  # plenty of misses
    x1 = RNG.uniform(0, 200, t)
    y1 = RNG.uniform(0, 200, t)
    boxes = jnp.asarray(
        np.stack([x1, y1, x1 + RNG.uniform(5, 56, t),
                  y1 + RNG.uniform(5, 56, t)], -1).astype(np.float32))
    ov_full, ob_full = gate_scan(has, boxes, 256, 256)

    for splits in ([40, 30, 27], [1] * 7 + [90], [97], [50, 47]):
        state = gate_init()
        ovs, obs = [], []
        i = 0
        for n in splits:
            state, (ov, ob) = gate_scan_carry(state, has[i:i + n],
                                              boxes[i:i + n], 256, 256)
            ovs.append(np.asarray(ov))
            obs.append(np.asarray(ob))
            i += n
        np.testing.assert_array_equal(np.concatenate(ovs), np.asarray(ov_full))
        np.testing.assert_array_equal(np.concatenate(obs), np.asarray(ob_full))


@pytest.fixture(scope="module")
def pipe():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    _, uv = init_unet(k1, dtype=jnp.float32)
    _, yv = init_yolo(k2, dtype=jnp.float32)
    return GlottalPipelines(unet_variables=uv, yolo_variables=yv, conf=0.0,
                            dtype=jnp.float32)


@pytest.fixture(scope="module")
def video():
    return synthetic_video(t=23, size=256, seed=9)[0]


def _chunked(video, sizes):
    i = 0
    for n in sizes:
        yield video[i:i + n]
        i += n


def test_stream_unet_matches_batch(pipe, video):
    want = np.asarray(pipe.yolo_unet_areas(video))
    got = pipe.stream_areas(_chunked(video, [9, 8, 6]), "unet")
    np.testing.assert_array_equal(got, want)


def test_stream_unet_only_matches_batch(pipe, video):
    _, gray = pipe.prepare(video)
    want = np.asarray(pipe.unet_only_areas(gray))
    got = pipe.stream_areas(_chunked(video, [16, 7]), "unet-only")
    np.testing.assert_array_equal(got, want)


def test_stream_empty_and_unknown(pipe):
    assert pipe.stream_areas(iter([]), "unet").size == 0
    assert pipe.stream_features(iter([]), "unet") is None
    assert pipe.stream_areas(iter([]), "vft").size == 0
    with pytest.raises(ValueError):
        pipe.stream_areas(iter([]), "nope")


@pytest.fixture(scope="module")
def seq_pipe(pipe):
    """Sequential-scan tracker forms — the bit-exactness target for
    streaming (the frame-parallel default reassociates float sums)."""
    return GlottalPipelines(unet_variables=pipe.unet_variables,
                            yolo_variables=pipe.yolo_variables, conf=0.0,
                            dtype=jnp.float32, parallel_trackers=False)


@pytest.mark.parametrize("splits", [[9, 8, 6], [1, 1, 21], [23]])
def test_stream_vft_matches_sequential_whole_video(seq_pipe, video, splits):
    want = seq_pipe.vft_areas(video)
    got = seq_pipe.stream_areas(_chunked(video, splits), "vft")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("splits", [[9, 8, 6], [1, 1, 21], [23]])
def test_stream_guided_vft_matches_sequential_whole_video(seq_pipe, video,
                                                          splits):
    want = seq_pipe.guided_vft_areas(video)
    got = seq_pipe.stream_areas(_chunked(video, splits), "guided-vft")
    np.testing.assert_array_equal(got, want)


def test_iter_frames_bgr_matches_full_decode(video):
    import cv2

    from openglottal_tpu.data.video import iter_frames_bgr, load_frames_bgr

    tmp = tempfile.mkdtemp()
    avi = os.path.join(tmp, "v.avi")
    wr = cv2.VideoWriter(avi, cv2.VideoWriter_fourcc(*"MJPG"), 30, (256, 256))
    for f in video:
        wr.write(f)
    wr.release()
    full = load_frames_bgr(avi)
    chunks = list(iter_frames_bgr(avi, chunk=7))
    assert [len(c) for c in chunks] == [7, 7, 7, 2]
    np.testing.assert_array_equal(np.concatenate(chunks), full)


@pytest.fixture(scope="module")
def color_video(video):
    """Genuinely non-monochrome frames: the whole-video paths detect these
    on real BGR (detect_video), so streaming must too."""
    v = video.copy()
    v[..., 2] = np.clip(v[..., 2].astype(np.int16) + 40, 0, 255)
    v[..., 0] = np.clip(v[..., 0].astype(np.int16) - 25, 0, 255)
    return v


def test_stream_color_unet_matches_batch(pipe, color_video):
    from openglottal_tpu.pipelines import is_monochrome

    assert not is_monochrome(color_video)
    want = np.asarray(pipe.yolo_unet_areas(color_video))
    got = pipe.stream_areas(_chunked(color_video, [9, 8, 6]), "unet")
    np.testing.assert_array_equal(got, want)


def test_stream_color_crop_unet_matches_batch(pipe, color_video):
    pipe_c = GlottalPipelines(unet_variables=pipe.unet_variables,
                              crop_unet_variables=pipe.unet_variables,
                              yolo_variables=pipe.yolo_variables,
                              conf=0.0, dtype=jnp.float32)
    _, _, _, want = pipe_c.run_pipeline_full(color_video, "crop-unet")
    got = pipe_c.stream_areas(_chunked(color_video, [10, 9, 4]), "crop-unet")
    np.testing.assert_array_equal(got, np.asarray(want))


def test_stream_rejects_non_256_chunks(pipe):
    bad = np.zeros((4, 128, 128, 3), np.uint8)
    with pytest.raises(ValueError, match="256"):
        pipe.stream_areas(iter([bad]), "unet")


def test_stream_crop_unet_matches_batch(pipe, video):
    pipe_c = GlottalPipelines(unet_variables=pipe.unet_variables,
                              crop_unet_variables=pipe.unet_variables,
                              yolo_variables=pipe.yolo_variables,
                              conf=0.0, dtype=jnp.float32)
    _, _, _, want = pipe_c.run_pipeline_full(video, "crop-unet")
    got = pipe_c.stream_areas(_chunked(video, [10, 9, 4]), "crop-unet")
    np.testing.assert_array_equal(got, np.asarray(want))
