"""The five inference pipelines, batched over the frame axis.

Reference dataflows (README.md:17-29; openglottal/features.py):
  1. vft         YOLO -> fixed-size crop -> motion VFT inside crop
  2. guided-vft  YOLO bbox as ROI on full frame -> YOLOGuidedVFT
  3. unet        full-frame U-Net, mask counted inside YOLO bbox (gated)
  4. crop-unet   YOLO crop -> letterbox 256² -> crop-trained U-Net -> paste back
  5. unet-only   full-frame U-Net, no gate

TPU re-architecture (SURVEY.md §7): the reference loops Python per frame with
two host<->device copies per model; here each stateless model pass (YOLO,
U-Net) runs batched over fixed-size frame chunks, the tiny order-dependent
recurrences (gate FSM, tracker EMAs) run as ``lax.scan`` over per-frame
summaries, and dynamic crop geometry becomes traced interpolation matrices
(ops/resize.py) so nothing has a dynamic shape.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from openglottal_tpu.features import kinematic_features
from openglottal_tpu.models.gate import GateParams, gate_scan
from openglottal_tpu.models.tracker import (
    VFTParams,
    YGVFTParams,
    vft_initialize,
    vft_parallel,
    vft_scan,
    vft_scan_carry,
    ygvft_initialize,
    ygvft_parallel,
    ygvft_parallel_multi,
    ygvft_scan,
    ygvft_scan_carry,
)
from openglottal_tpu.models.fold import UNET_STEM, YOLO_STEM, absorb_u8_scale
from openglottal_tpu.models.unet import UNet
from openglottal_tpu.models.yolo import YOLOv8, max_conf_detect
from openglottal_tpu.ops.resize import (
    crop_resize_bilinear,
    dyn_letterbox_geometry,
    dyn_letterbox_matrix_nearest,
    dyn_unletterbox_matrix_nearest,
    resize_bilinear,
)

def _u8_unet(variables):
    """U-Net variables with the /255 input normalisation folded into the
    stem kernel (models/fold.absorb_u8_scale) — the chunk functions feed raw
    0..255 pixel values, skipping a full-tensor normalisation pass."""
    return absorb_u8_scale(variables, UNET_STEM)


def _u8_yolo(variables):
    """YOLO variables with the /255 fold (see :func:`_u8_unet`)."""
    return absorb_u8_scale(variables, YOLO_STEM)


VFT_INIT = 2    # reference features.py:31
YGVFT_INIT = 2  # reference features.py:32
CHUNK = 128     # frame-chunk size for batched model passes
# (chunk-size sweep on v5e, scripts/perf_probe.py chunk: 128 beats 256/512
# both serial and pipelined — bigger chunks lose more to HBM pressure than
# they gain in loop-trip amortisation)
MAX_COHORT_K = 8
# largest multi-video cohort compiled as one fused graph: the *_multi
# methods split bigger cohorts into sub-batches of at most this size.  A
# K-video batch holds K padded uint8 videos (K x T_pad x 256² = 32 MB each)
# plus the chunk loop's activations in HBM; past ~8 videos the shared-HBM
# paging cliff documented in CLAUDE.md ("blob-selection tables") is one
# allocation away, and the round-trip amortisation has long saturated
# (measured: batch 4 already recovers the ~40 ms/video dispatch overhead,
# results/PROFILE_r03.md).

# TPU conv-emitter tuning: raising the scoped-VMEM budget lets XLA's conv
# emitters pick larger tiles (whole-video U-Net pass 130.1 -> 126.1 ms on
# v5e, a retired round-3 probe; default budget is 16 MiB).  TPU-only option, so
# it is resolved per backend at call time.
_TPU_COMPILER_OPTS = {"xla_tpu_scoped_vmem_limit_kib": 65536}


def _jit_hot(fn=None, **jit_kwargs):
    """``jax.jit`` for the conv-heavy chunk graphs: on TPU backends compiles
    with :data:`_TPU_COMPILER_OPTS`, elsewhere plain jit (the options are
    TPU-compiler flags and would be rejected).  Resolved at call time so the
    import order / backend re-pointing dance (__graft_entry__) stays valid.
    ``.lower`` delegates to the plain variant (bench.py cost analysis)."""
    if fn is None:
        return partial(_jit_hot, **jit_kwargs)
    f_plain = jax.jit(fn, **jit_kwargs)
    f_tpu = jax.jit(fn, compiler_options=_TPU_COMPILER_OPTS, **jit_kwargs)

    @functools.wraps(fn)
    def call(*args, **kwargs):
        f = f_tpu if jax.default_backend() == "tpu" else f_plain
        return f(*args, **kwargs)

    call.lower = f_plain.lower
    return call

# jitted tracker initializers for the streaming paths (the raw functions are
# trace-level; calling them eagerly would dispatch op-by-op through the TPU
# tunnel)
_vft_init_jit = partial(jax.jit, static_argnames=("p",))(vft_initialize)
_ygvft_init_jit = partial(jax.jit, static_argnames=("p",))(ygvft_initialize)


def to_device(x):
    """Fast host->HBM transfer.  jax.device_put streams ~2 GB/s through the
    TPU tunnel where jnp.asarray takes a >10x slower conversion path
    (measured; see bench.py) — every big host array must come through here."""
    if isinstance(x, jax.Array):
        return x
    return jax.device_put(np.ascontiguousarray(x))


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _bucket(t: int, chunk: int = CHUNK) -> int:
    return max(chunk, ((t + chunk - 1) // chunk) * chunk)


def _require_256(gray):
    """Streaming contract: chunks arrive at the models' native 256² (the
    whole-video paths letterbox other sizes through 256², so silently running
    native-size models here would diverge).  Returns (h, w)."""
    h, w = gray.shape[1:3]
    if (h, w) != (256, 256):
        raise ValueError(
            f"streaming expects 256² chunks, got {(h, w)} — letterbox the "
            f"chunks first (ops/resize.letterbox), as the whole-video paths "
            f"do internally")
    return h, w


@_jit_hot(static_argnames=("dtype", "fuse"))
def _unet_chunk(variables, gray_u8, dtype=jnp.bfloat16, fuse: bool = False):
    """U-Net on a chunk of 256² grayscale frames -> boolean masks.

    Equivalent to per-frame unet_segment_frame (utils.py:218-241) for frames
    already at 256²; callers resize otherwise.
    """
    model = UNet(dtype=dtype, fuse_bn=fuse)
    x = gray_u8.astype(jnp.float32)[..., None]
    logits = model.apply(_u8_unet(variables), x, train=False)
    return logits[..., 0] > 0  # sigmoid(x) > 0.5  <=>  x > 0


@_jit_hot(static_argnames=("conf", "dtype", "fuse"))
def _yolo_chunk(variables, bgr_u8, conf: float = 0.25, dtype=jnp.bfloat16,
                fuse: bool = False):
    """YOLO max-conf detection on a chunk of 256² BGR frames."""
    model = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)
    x = bgr_u8[..., ::-1].astype(jnp.float32)
    outs = model.apply(_u8_yolo(variables), x, train=False)
    h, w = x.shape[1:3]
    return max_conf_detect(outs, h, w, conf)


def _gray_stem_input(variables, gray_u8):
    """Raw-pixel model input for monochrome frames (the /255 normalisation
    lives in the stem kernel — :func:`_u8_yolo`), matched to the stem's
    static input-channel count: 1 for ``fold_gray_stem``-folded variables
    (the kernel-summed stem skips reading 3x the input), 3 otherwise
    (channels replicated on device — bit-identical to the BGR path for
    equal-channel sources)."""
    x = gray_u8.astype(jnp.float32)[..., None]
    cin = variables["params"]["ConvBNSiLU_0"]["Conv_0"]["kernel"].shape[2]
    if cin == 3:
        x = jnp.broadcast_to(x, x.shape[:3] + (3,))
    return x


@_jit_hot(static_argnames=("conf", "dtype", "fuse"))
def _yolo_chunk_gray(variables, gray_u8, conf: float = 0.25,
                     dtype=jnp.bfloat16, fuse: bool = False):
    """YOLO on monochrome frames without a host-side channel replication.

    High-speed endoscopy video is monochrome (4000 fps cameras;
    paper/main.tex:285-287), so the host->HBM transfer — the pipeline's real
    bottleneck through the TPU tunnel — only needs one channel.  With a
    gray-folded stem (models/fold.fold_gray_stem) the replication disappears
    entirely; numerics match the BGR path up to one rounding of the summed
    stem kernel."""
    model = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)
    x = _gray_stem_input(variables, gray_u8)
    outs = model.apply(_u8_yolo(variables), x, train=False)
    h, w = x.shape[1:3]
    return max_conf_detect(outs, h, w, conf)


def _yolo_unet_chunk_fn(unet_variables, yolo_variables, h, w, conf: float,
                        dtype, fuse: bool):
    """The per-chunk YOLO+UNet body shared by every fused/batched/streaming
    form of pipeline 3: (CHUNK, h, w) uint8 -> (masks, has, box).  One
    definition means the per-video, cohort, and streaming graphs are
    bit-identical by construction (the equality tests in
    tests/test_pipelines.py pin it empirically on top)."""
    unet = UNet(dtype=dtype, fuse_bn=fuse)
    yolo = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)
    uv, yv = _u8_unet(unet_variables), _u8_yolo(yolo_variables)

    def per_chunk(g):
        x = g.astype(jnp.float32)[..., None]
        masks = unet.apply(uv, x, train=False)[..., 0] > 0  # sigmoid>0.5
        outs = yolo.apply(yv, _gray_stem_input(yolo_variables, g),
                          train=False)
        has, box, _ = max_conf_detect(outs, h, w, conf)
        return masks, has, box

    return per_chunk


def _yolo_summary_chunk_fn(yolo_variables, h, w, conf: float, dtype,
                           fuse: bool):
    """Detection summaries only — (CHUNK, h, w) uint8 -> (has, raw box) —
    the first pass of the windowed two-pass yolo+unet graph (the gate scan
    needs every frame's detection before the U-Net tail can be windowed to
    the gate boxes)."""
    yolo = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)
    yv = _u8_yolo(yolo_variables)

    def per_chunk(g):
        outs = yolo.apply(yv, _gray_stem_input(yolo_variables, g),
                          train=False)
        has, box, _ = max_conf_detect(outs, h, w, conf)
        return has, box

    return per_chunk


def _unet_windowed_areas_chunk_fn(unet_variables, h, w, dtype, fuse: bool,
                                  win: int, tail: str = "window"):
    """Second pass of the windowed yolo+unet graph: (chunk gray, valid,
    boxes) -> per-frame in-box areas.

    The encoder + mid decoder always run full-frame (deeper levels need the
    whole field of view); the 256²-level tail — ~24 ms of the 107.75
    ms/video device time, HBM-bandwidth-floor-bound
    (results/PROFILE_r03.md) — runs on ONE interior (win, win) window per
    chunk covering the union of the chunk's valid gate boxes
    (models/unet.chunk_window_origin; the box is quasi-static across 128
    consecutive frames), with an in-graph ``lax.cond`` full-frame fallback
    per chunk when the union outgrows the window or touches the frame
    border.  Output parity: the area only counts mask pixels inside the
    box ⊆ window (_box_area_sums semantics, reference features.py:237-245);
    windowed logits equal the full-frame tail's values at every window
    pixel — exactly in f32, and in bf16 up to conv-tiling reassociation
    flips of near-zero logits whose waveform effect is the same distance
    from the f32 ground truth as the full-frame bf16 path's (measured
    rel-L1 ~0.4-1% for both, equidistant; the int8 divergence class —
    pinned by tests/test_unet_window.py + the selftest drift gate)."""
    from openglottal_tpu.models.unet import (_tail_from_ymw,
                                             chunk_window_origin,
                                             unet_apply_to_d3,
                                             unet_mid_full,
                                             unet_mid_window,
                                             unet_tail_full)

    uv = _u8_unet(unet_variables)

    def per_chunk(g, valid, boxes):
        x = g.astype(jnp.float32)[..., None]
        d3out, skip2, skip1 = unet_apply_to_d3(uv, x, dtype, fuse)

        if tail == "full":
            y_mid = unet_mid_full(uv, d3out, skip2, dtype, fuse)
            logits = unet_tail_full(uv, y_mid, skip1, dtype, fuse)[..., 0]
            return _box_area_sums(logits > 0, valid, boxes), jnp.asarray(True)

        # lattice 4 / margin 6: unet_mid_window's quarter-res slice
        # alignment (both decoder levels window together).  NO in-graph
        # fallback branch: a per-chunk lax.cond measured ~7.5 ms of
        # schedule-stall dead time per chunk on TPU v5e (identical per-op
        # totals, +30 ms module wall) — instead the graph SPECULATES
        # windowed and returns ``fits`` so the caller can redo the rare
        # non-fitting video through the full graph (origins are clipped
        # in-bounds, so a non-fitting chunk computes safely — just not
        # over the whole box).
        fits, oy, ox = chunk_window_origin(boxes, valid, h, w, win,
                                           lattice=4, margin=6)
        ymw = unet_mid_window(uv, d3out, skip2, oy, ox, dtype, win)
        logits = _tail_from_ymw(uv, ymw, skip1, oy, ox, dtype, win)[..., 0]
        m = logits > 0  # sigmoid>0.5
        rows = oy + jnp.arange(win)
        cols = ox + jnp.arange(win)
        rm = (rows[None] >= boxes[:, 1:2]) & (rows[None] < boxes[:, 3:4])
        cm = (cols[None] >= boxes[:, 0:1]) & (cols[None] < boxes[:, 2:3])
        area = (m & rm[:, :, None] & cm[:, None, :]).sum((1, 2))
        return jnp.where(valid, area.astype(jnp.float32), 0.0), fits

    return per_chunk


def _yolo_summary_chunk_fn_q(qparams, yolo_variables, h, w, conf: float,
                             dtype, fuse: bool):
    """Detection summaries for the quantized two-pass graph: bf16 YOLO
    unless ``qparams`` carries a "yolo" entry (the "int8-full" mode) — the
    same detector split as :func:`_yolo_unet_chunk_fn_q`."""
    from openglottal_tpu.models.quant import qyolo_forward

    if "yolo" not in qparams:
        return _yolo_summary_chunk_fn(yolo_variables, h, w, conf, dtype,
                                      fuse)
    cin = qparams["yolo"]["stem_bf16"]["kernel"].shape[2]

    def per_chunk(g):
        x = g.astype(jnp.float32)[..., None]
        if cin == 3:
            x = jnp.broadcast_to(x, x.shape[:3] + (3,))
        outs = qyolo_forward(qparams["yolo"], x)
        has, box, _ = max_conf_detect(outs, h, w, conf)
        return has, box

    return per_chunk


def _unet_windowed_areas_chunk_fn_q(qparams, h, w, win: int,
                                    tail: str = "window"):
    """int8 counterpart of :func:`_unet_windowed_areas_chunk_fn`: the
    quantized U-Net split at the 64²-level decoder, levels 2-3 + head
    windowed to the chunk's gate-box union (models/quant.qunet_to_d3 /
    qunet_tail_from_d3_window).  The int8 convs accumulate in s32 (exact
    under retiling), but the bf16 upsample epilogue retiles per shape, so
    on TPU the windowed form has the same near-zero-logit flip class as
    the bf16 path (measured + gated; bit-equal on the CPU lowering —
    tests/test_quant_window.py)."""
    from openglottal_tpu.models.quant import (qunet_tail_from_d3_full,
                                              qunet_tail_from_d3_window,
                                              qunet_to_d3)
    from openglottal_tpu.models.unet import chunk_window_origin

    def per_chunk(g, valid, boxes):
        x8, skip1, skip2 = qunet_to_d3(qparams["unet"], g)

        if tail == "full":
            logits = qunet_tail_from_d3_full(qparams["unet"], x8, skip1,
                                             skip2)
            return _box_area_sums(logits > 0, valid, boxes), jnp.asarray(True)

        fits, oy, ox = chunk_window_origin(boxes, valid, h, w, win,
                                           lattice=4, margin=6)
        logits = qunet_tail_from_d3_window(qparams["unet"], x8, skip1,
                                           skip2, oy, ox, win)
        m = logits > 0  # sigmoid>0.5
        rows = oy + jnp.arange(win)
        cols = ox + jnp.arange(win)
        rm = (rows[None] >= boxes[:, 1:2]) & (rows[None] < boxes[:, 3:4])
        cm = (cols[None] >= boxes[:, 0:1]) & (cols[None] < boxes[:, 2:3])
        area = (m & rm[:, :, None] & cm[:, None, :]).sum((1, 2))
        return jnp.where(valid, area.astype(jnp.float32), 0.0), fits

    return per_chunk


def _yolo_unet_chunk_fn_q(qparams, yolo_variables, h, w, conf: float, dtype,
                          fuse: bool):
    """int8 counterpart of :func:`_yolo_unet_chunk_fn` (U-Net always
    quantized; detector bf16 unless ``qparams`` carries a "yolo" entry —
    the "int8-full" mode)."""
    from openglottal_tpu.models.quant import qunet_masks, qyolo_forward

    if "yolo" not in qparams:
        yolo = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)
        yv = _u8_yolo(yolo_variables)
    else:
        cin = qparams["yolo"]["stem_bf16"]["kernel"].shape[2]

    def per_chunk(g):
        masks = qunet_masks(qparams["unet"], g)
        if "yolo" in qparams:
            x = g.astype(jnp.float32)[..., None]
            if cin == 3:
                x = jnp.broadcast_to(x, x.shape[:3] + (3,))
            outs = qyolo_forward(qparams["yolo"], x)
        else:
            outs = yolo.apply(yv, _gray_stem_input(yolo_variables, g),
                              train=False)
        has, box, _ = max_conf_detect(outs, h, w, conf)
        return masks, has, box

    return per_chunk


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse"))
def _fused_yolo_unet_video(unet_variables, yolo_variables, gray_u8, t_real,
                           conf: float, dtype, gate_params: GateParams,
                           fuse: bool = False):
    """ONE dispatch for the whole video -> area waveform (YOLO+UNet path).

    gray_u8: (T_pad, 256, 256) uint8, T_pad a multiple of CHUNK.  Chunks run
    under ``lax.map`` (bounded HBM), the gate scan masks padded frames as
    misses beyond ``t_real``.  Collapsing ~12 jitted calls per video into one
    removes the per-dispatch runtime overhead that dominated after the
    transfer optimisations (see bench.py history).
    """
    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    chunks = gray_u8.reshape(t_pad // CHUNK, CHUNK, h, w)

    per_chunk = _yolo_unet_chunk_fn(unet_variables, yolo_variables, h, w,
                                    conf, dtype, fuse)
    masks, has, raw = jax.lax.map(per_chunk, chunks)
    masks = masks.reshape(t_pad, h, w)
    has = has.reshape(t_pad) & (jnp.arange(t_pad) < t_real)
    raw = raw.reshape(t_pad, 4)
    valid, boxes = gate_scan(has, raw, h, w, params=gate_params)
    return _box_area_sums(masks, valid, boxes)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse", "win",
                           "tail"))
def _fused_yolo_unet_video_w(unet_variables, yolo_variables, gray_u8, t_real,
                             conf: float, dtype, gate_params: GateParams,
                             fuse: bool = True, win: int = 160,
                             tail: str = "window"):
    """Windowed-tail form of :func:`_fused_yolo_unet_video` — still ONE
    dispatch, restructured as two chunk loops so the U-Net's 256²-level
    decoder can window to the gate boxes: (1) YOLO summaries for every
    frame, (2) gate scan, (3) U-Net with the windowed tail
    (:func:`_unet_windowed_areas_chunk_fn`) reading the scanned boxes.
    Same total model math as the one-loop form (the encoder reads the video
    twice — ~66 MB/video, noise next to the ~20 GB of activation traffic);
    output parity documented at the chunk fn.

    Returns (areas (T_pad,), ok scalar).  ``tail`` "window" (default)
    SPECULATES: the decoder always runs windowed and ``ok`` reports whether
    every chunk's boxes fit — False means the caller must redo through the
    full graph (tail="full").  There is deliberately NO in-graph fallback:
    a ``lax.cond`` around the decoder measured 87.3 ms/video vs 57.75
    speculative on TPU v5e with IDENTICAL per-op totals — a TPU conditional
    suppresses the scheduler's cross-op overlap across its whole body
    (both per-chunk and whole-video cond forms; results/PROFILE_r05.md)."""
    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    nc = t_pad // CHUNK
    chunks = gray_u8.reshape(nc, CHUNK, h, w)

    has, raw = jax.lax.map(
        _yolo_summary_chunk_fn(yolo_variables, h, w, conf, dtype, fuse),
        chunks)
    has = has.reshape(t_pad) & (jnp.arange(t_pad) < t_real)
    raw = raw.reshape(t_pad, 4)
    valid, boxes = gate_scan(has, raw, h, w, params=gate_params)

    vc = valid.reshape(nc, CHUNK)
    bc = boxes.reshape(nc, CHUNK, 4)
    per_chunk = _unet_windowed_areas_chunk_fn(unet_variables, h, w,
                                              dtype, fuse, win, tail)
    areas, fits = jax.lax.map(lambda a: per_chunk(*a), (chunks, vc, bc))
    return areas.reshape(t_pad), fits.all()


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse", "win",
                           "tail"))
def _fused_yolo_unet_multi_w(unet_variables, yolo_variables, gray_u8, t_real,
                             conf: float, dtype, gate_params: GateParams,
                             fuse: bool = True, win: int = 160,
                             tail: str = "window"):
    """Windowed-tail cohort form (see :func:`_fused_yolo_unet_multi` for
    the cohort-serving shape and :func:`_fused_yolo_unet_video_w` for the
    two-pass windowing and the speculation contract): K videos' chunks
    share both loops; the per-video gate scans run under ``vmap`` between
    them.  Uses the same chunk closures as the per-video windowed graph, so
    cohort == per-video by construction.  Returns (areas (K, T_pad), ok
    (K,)) — per-VIDEO speculation flags (chunks never span videos); the
    caller redoes ok=False videos through the full graph at fetch time."""
    k, t_pad, h, w = gray_u8.shape
    nc = k * t_pad // CHUNK
    chunks = gray_u8.reshape(nc, CHUNK, h, w)

    has, raw = jax.lax.map(
        _yolo_summary_chunk_fn(yolo_variables, h, w, conf, dtype, fuse),
        chunks)
    has = has.reshape(k, t_pad) & (jnp.arange(t_pad)[None] < t_real[:, None])
    raw = raw.reshape(k, t_pad, 4)
    valid, boxes = jax.vmap(
        lambda hh, rr: gate_scan(hh, rr, h, w, params=gate_params))(has, raw)

    per_chunk = _unet_windowed_areas_chunk_fn(unet_variables, h, w, dtype,
                                              fuse, win, tail)
    areas, fits = jax.lax.map(
        lambda a: per_chunk(*a),
        (chunks, valid.reshape(nc, CHUNK), boxes.reshape(nc, CHUNK, 4)))
    # per-VIDEO ok: chunks never span videos (t_pad is a CHUNK multiple)
    return areas.reshape(k, t_pad), fits.reshape(k, t_pad // CHUNK).all(1)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse", "win",
                           "tail"))
def _fused_yolo_unet_video_qw(qparams, yolo_variables, gray_u8, t_real,
                              conf: float, dtype, gate_params: GateParams,
                              fuse: bool = True, win: int = 160,
                              tail: str = "window"):
    """Quantized two-pass windowed graph (int8 counterpart of
    :func:`_fused_yolo_unet_video_w`, same speculation contract; the
    windowed int8 decoder is BIT-identical to the full int8 pass)."""
    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    nc = t_pad // CHUNK
    chunks = gray_u8.reshape(nc, CHUNK, h, w)

    has, raw = jax.lax.map(
        _yolo_summary_chunk_fn_q(qparams, yolo_variables, h, w, conf, dtype,
                                 fuse), chunks)
    has = has.reshape(t_pad) & (jnp.arange(t_pad) < t_real)
    raw = raw.reshape(t_pad, 4)
    valid, boxes = gate_scan(has, raw, h, w, params=gate_params)

    per_chunk = _unet_windowed_areas_chunk_fn_q(qparams, h, w, win, tail)
    areas, fits = jax.lax.map(
        lambda a: per_chunk(*a),
        (chunks, valid.reshape(nc, CHUNK), boxes.reshape(nc, CHUNK, 4)))
    return areas.reshape(t_pad), fits.all()


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse", "win",
                           "tail"))
def _fused_yolo_unet_multi_qw(qparams, yolo_variables, gray_u8, t_real,
                              conf: float, dtype, gate_params: GateParams,
                              fuse: bool = True, win: int = 160,
                              tail: str = "window"):
    """Quantized windowed cohort graph (int8 counterpart of
    :func:`_fused_yolo_unet_multi_w`; per-video ok flags)."""
    k, t_pad, h, w = gray_u8.shape
    nc = k * t_pad // CHUNK
    chunks = gray_u8.reshape(nc, CHUNK, h, w)

    has, raw = jax.lax.map(
        _yolo_summary_chunk_fn_q(qparams, yolo_variables, h, w, conf, dtype,
                                 fuse), chunks)
    has = has.reshape(k, t_pad) & (jnp.arange(t_pad)[None] < t_real[:, None])
    raw = raw.reshape(k, t_pad, 4)
    valid, boxes = jax.vmap(
        lambda hh, rr: gate_scan(hh, rr, h, w, params=gate_params))(has, raw)

    per_chunk = _unet_windowed_areas_chunk_fn_q(qparams, h, w, win, tail)
    areas, fits = jax.lax.map(
        lambda a: per_chunk(*a),
        (chunks, valid.reshape(nc, CHUNK), boxes.reshape(nc, CHUNK, 4)))
    return areas.reshape(k, t_pad), fits.reshape(k, t_pad // CHUNK).all(1)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse"))
def _fused_yolo_unet_multi(unet_variables, yolo_variables, gray_u8, t_real,
                           conf: float, dtype, gate_params: GateParams,
                           fuse: bool = False):
    """ONE dispatch for a BATCH of videos -> area waveforms (K, T_pad).

    gray_u8: (K, T_pad, 256, 256) uint8 (videos padded to a common bucketed
    length); t_real: (K,) i32.  The chunk loop runs over all K·T_pad/CHUNK
    chunks in one ``lax.map`` (same bounded-HBM per-chunk graph as
    :func:`_fused_yolo_unet_video`), then the per-video gate scans run under
    ``vmap``.  This is the cohort-serving shape (analyze_gaw processes 65
    patient videos, reference scripts/analyze_gaw.py:123): one relay
    dispatch+fetch round-trip (~40 ms measured, results/PROFILE_r03.md) is
    paid per BATCH instead of per video.
    """
    k, t_pad, h, w = gray_u8.shape
    chunks = gray_u8.reshape(k * t_pad // CHUNK, CHUNK, h, w)

    per_chunk = _yolo_unet_chunk_fn(unet_variables, yolo_variables, h, w,
                                    conf, dtype, fuse)
    masks, has, raw = jax.lax.map(per_chunk, chunks)
    masks = masks.reshape(k, t_pad, h, w)
    has = has.reshape(k, t_pad) & (jnp.arange(t_pad)[None] < t_real[:, None])
    raw = raw.reshape(k, t_pad, 4)
    valid, boxes = jax.vmap(
        lambda hh, rr: gate_scan(hh, rr, h, w, params=gate_params))(has, raw)
    return jax.vmap(_box_area_sums)(masks, valid, boxes)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse"))
def _fused_yolo_unet_multi_q(qparams, yolo_variables, gray_u8, t_real,
                             conf: float, dtype, gate_params: GateParams,
                             fuse: bool = False):
    """int8 variant of :func:`_fused_yolo_unet_multi` (cohort serving in the
    opt-in quantized mode): same batched chunk loop + vmapped per-video gate
    scans, with the U-Net post-training-quantized (models/quant.qunet_masks)
    and the detector bf16 unless ``qparams`` carries a "yolo" entry
    ("int8-full") — the same split as :func:`_fused_yolo_unet_video_q`."""
    k, t_pad, h, w = gray_u8.shape
    chunks = gray_u8.reshape(k * t_pad // CHUNK, CHUNK, h, w)

    per_chunk = _yolo_unet_chunk_fn_q(qparams, yolo_variables, h, w, conf,
                                      dtype, fuse)
    masks, has, raw = jax.lax.map(per_chunk, chunks)
    masks = masks.reshape(k, t_pad, h, w)
    has = has.reshape(k, t_pad) & (jnp.arange(t_pad)[None] < t_real[:, None])
    raw = raw.reshape(k, t_pad, 4)
    valid, boxes = jax.vmap(
        lambda hh, rr: gate_scan(hh, rr, h, w, params=gate_params))(has, raw)
    return jax.vmap(_box_area_sums)(masks, valid, boxes)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse"))
def _fused_yolo_unet_video_q(qparams, yolo_variables, gray_u8, t_real,
                             conf: float, dtype, gate_params: GateParams,
                             fuse: bool = False):
    """int8 variant of :func:`_fused_yolo_unet_video` (opt-in serving mode,
    ``GlottalPipelines(quant="int8" | "int8-full")``).

    The U-Net always runs post-training-quantized (models/quant.qunet_masks
    — s8xs8->s32 MXU convs, 1.5-3.5x faster per shape than bf16 on v5e, and
    half the bytes through every bandwidth-floor 256² stage).  The YOLOv8n
    detector runs bf16 unless ``qparams`` carries a "yolo" entry
    ("int8-full"): quantizing it measured a perf WASH at pipeline level
    (6.8k vs the 6.8-7.1k bf16-YOLO band — its thin 16/32-channel stages
    are latency/bandwidth-bound, and requant passes eat the MXU gain), so
    the production "int8" mode keeps detection bit-identical to the default
    path and the accuracy story confined to the U-Net.
    """
    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    chunks = gray_u8.reshape(t_pad // CHUNK, CHUNK, h, w)

    per_chunk = _yolo_unet_chunk_fn_q(qparams, yolo_variables, h, w, conf,
                                      dtype, fuse)
    masks, has, raw = jax.lax.map(per_chunk, chunks)
    masks = masks.reshape(t_pad, h, w)
    has = has.reshape(t_pad) & (jnp.arange(t_pad) < t_real)
    raw = raw.reshape(t_pad, 4)
    valid, boxes = gate_scan(has, raw, h, w, params=gate_params)
    return _box_area_sums(masks, valid, boxes)


@_jit_hot(static_argnames=())
def _fused_unet_only_video_q(qparams, gray_u8):
    """int8 variant of :func:`_fused_unet_only_video` (pipeline 5)."""
    from openglottal_tpu.models.quant import qunet_masks

    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    chunks = gray_u8.reshape(t_pad // CHUNK, CHUNK, h, w)

    def per_chunk(g):
        return qunet_masks(qparams, g).sum((1, 2)).astype(jnp.float32)

    return jax.lax.map(per_chunk, chunks).reshape(t_pad)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse"))
def _sharded_yolo_unet_video(unet_variables, yolo_variables, gray_u8, t_real,
                             conf: float, dtype, gate_params: GateParams,
                             fuse: bool = False):
    """Mesh form of :func:`_fused_yolo_unet_video`: the whole (T_pad, 256,
    256) video as ONE batched pass with the frame axis sharded over the
    mesh's ``data`` axis (callers device_put the input with a
    ``P("data")`` NamedSharding; params replicated).

    The single-chip fused path bounds HBM by serializing CHUNK-frame slices
    under ``lax.map`` — under a mesh that would serialize the *shards* too,
    so here the full frame axis runs as one partitioned batch (per-device
    activations = T_pad/n_dev frames) and XLA all-gathers only the tiny
    (T,) per-frame summaries for the gate scan.
    """
    t_pad, h, w = gray_u8.shape
    unet = UNet(dtype=dtype, fuse_bn=fuse)
    yolo = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)
    x = gray_u8.astype(jnp.float32)[..., None]
    masks = unet.apply(_u8_unet(unet_variables), x,
                       train=False)[..., 0] > 0  # sigmoid>0.5
    outs = yolo.apply(_u8_yolo(yolo_variables),
                      _gray_stem_input(yolo_variables, gray_u8), train=False)
    has, raw, _ = max_conf_detect(outs, h, w, conf)
    has = has & (jnp.arange(t_pad) < t_real)
    valid, boxes = gate_scan(has, raw, h, w, params=gate_params)
    return _box_area_sums(masks, valid, boxes)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse"))
def _sharded_yolo_unet_video_q(qparams, yolo_variables, gray_u8, t_real,
                               conf: float, dtype, gate_params: GateParams,
                               fuse: bool = False):
    """Mesh form of :func:`_fused_yolo_unet_video_q`: int8 serving under a
    frame-sharded mesh (VERDICT r3 item 6 — the fastest mode and the
    scale-out mode are no longer mutually exclusive).  Same structure as
    :func:`_sharded_yolo_unet_video` — one partitioned batched pass over the
    whole frame axis (qparams replicated; per-device activations =
    T_pad/n_dev frames), XLA gathers only the (T,) summaries for the gate
    scan — with the U-Net int8 (models/quant.qunet_masks) and the detector
    bf16 unless ``qparams`` carries a "yolo" entry ("int8-full")."""
    t_pad, h, w = gray_u8.shape
    from openglottal_tpu.models.quant import qunet_masks, qyolo_forward

    masks = qunet_masks(qparams["unet"], gray_u8)
    if "yolo" in qparams:
        cin = qparams["yolo"]["stem_bf16"]["kernel"].shape[2]
        x = gray_u8.astype(jnp.float32)[..., None]
        if cin == 3:
            x = jnp.broadcast_to(x, x.shape[:3] + (3,))
        outs = qyolo_forward(qparams["yolo"], x)
    else:
        yolo = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)
        outs = yolo.apply(_u8_yolo(yolo_variables),
                          _gray_stem_input(yolo_variables, gray_u8),
                          train=False)
    has, raw, _ = max_conf_detect(outs, h, w, conf)
    has = has & (jnp.arange(t_pad) < t_real)
    valid, boxes = gate_scan(has, raw, h, w, params=gate_params)
    return _box_area_sums(masks, valid, boxes)


@_jit_hot(static_argnames=())
def _qunet_sharded_chunk(qparams, gray_u8):
    """Mesh form of the quantized U-Net pass (unet-only pipeline under a
    mesh in the int8 serving mode): one frame-sharded batched pass."""
    from openglottal_tpu.models.quant import qunet_masks

    return qunet_masks(qparams, gray_u8)


@_jit_hot(static_argnames=("conf", "dtype", "fuse"))
def _stream_yolo_chunk(yolo_variables, gray_u8, conf: float, dtype,
                       fuse: bool = False):
    """YOLO-only per-segment detections for the streaming crop-unet path:
    (has (T_pad,), raw boxes (T_pad, 4)) for a (T_pad, 256, 256) segment."""
    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    chunks = gray_u8.reshape(t_pad // CHUNK, CHUNK, h, w)
    yolo = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)

    yv = _u8_yolo(yolo_variables)

    def per_chunk(g):
        outs = yolo.apply(yv, _gray_stem_input(yolo_variables, g),
                          train=False)
        has, box, _ = max_conf_detect(outs, h, w, conf)
        return has, box

    has, raw = jax.lax.map(per_chunk, chunks)
    return has.reshape(t_pad), raw.reshape(t_pad, 4)


@_jit_hot(static_argnames=("conf", "dtype", "fuse"))
def _stream_yolo_chunk_bgr(yolo_variables, bgr_u8, conf: float, dtype,
                           fuse: bool = False):
    """BGR variant of :func:`_stream_yolo_chunk` for color sources: the
    whole-video paths detect on the real BGR frames (``detect_video``), so
    color streaming must too to stay bit-identical."""
    t_pad = bgr_u8.shape[0]
    h, w = bgr_u8.shape[1:3]
    chunks = bgr_u8.reshape(t_pad // CHUNK, CHUNK, h, w, 3)
    yolo = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)

    yv = _u8_yolo(yolo_variables)

    def per_chunk(f):
        x = f[..., ::-1].astype(jnp.float32)
        outs = yolo.apply(yv, x, train=False)
        has, box, _ = max_conf_detect(outs, h, w, conf)
        return has, box

    has, raw = jax.lax.map(per_chunk, chunks)
    return has.reshape(t_pad), raw.reshape(t_pad, 4)


@_jit_hot(static_argnames=("dtype", "fuse"))
def _stream_unet_masks_chunk(unet_variables, gray_u8, dtype,
                             fuse: bool = False):
    """U-Net masks only, for streaming segments whose detections come from
    the BGR path (color sources)."""
    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    chunks = gray_u8.reshape(t_pad // CHUNK, CHUNK, h, w)
    unet = UNet(dtype=dtype, fuse_bn=fuse)

    uv = _u8_unet(unet_variables)

    def per_chunk(g):
        x = g.astype(jnp.float32)[..., None]
        return unet.apply(uv, x, train=False)[..., 0] > 0  # sigmoid>0.5

    return jax.lax.map(per_chunk, chunks).reshape(t_pad, h, w)


@_jit_hot(static_argnames=("conf", "dtype", "fuse"))
def _stream_yolo_unet_chunk(unet_variables, yolo_variables, gray_u8,
                            conf: float, dtype, fuse: bool = False):
    """Stateless per-segment compute for the streaming path: U-Net masks +
    raw max-conf detections for a (T_pad, 256, 256) uint8 segment (T_pad a
    multiple of CHUNK; lax.map bounds HBM).  The order-dependent gate runs
    OUTSIDE with a carried state (models/gate.gate_scan_carry)."""
    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    chunks = gray_u8.reshape(t_pad // CHUNK, CHUNK, h, w)

    per_chunk = _yolo_unet_chunk_fn(unet_variables, yolo_variables, h, w,
                                    conf, dtype, fuse)
    masks, has, raw = jax.lax.map(per_chunk, chunks)
    return (masks.reshape(t_pad, h, w), has.reshape(t_pad),
            raw.reshape(t_pad, 4))


@_jit_hot(static_argnames=("dtype", "fuse"))
def _fused_unet_only_video(unet_variables, gray_u8, dtype,
                           fuse: bool = False):
    """ONE dispatch: whole monochrome 256² video -> full-frame area waveform
    (pipeline 5).  Chunks under lax.map for bounded HBM."""
    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    chunks = gray_u8.reshape(t_pad // CHUNK, CHUNK, h, w)
    unet = UNet(dtype=dtype, fuse_bn=fuse)

    uv = _u8_unet(unet_variables)

    def per_chunk(g):
        x = g.astype(jnp.float32)[..., None]
        masks = unet.apply(uv, x, train=False)[..., 0] > 0  # sigmoid>0.5
        return masks.sum((1, 2)).astype(jnp.float32)

    return jax.lax.map(per_chunk, chunks).reshape(t_pad)


def _detect_gate_graph(yolo_variables, gray_u8, t_real, conf: float, dtype,
                       gate_params: GateParams, fuse: bool):
    """Trace-level detect+gate over a whole padded monochrome video: YOLO
    chunks under ``lax.map`` (bounded HBM) + the causal gate scan, with
    detections beyond ``t_real`` masked as misses (the padded tail can only
    extend the final hold — discarded when callers slice to ``t_real``).
    Shared body of :func:`_fused_gated_video` / :func:`_fused_ygvft_video`;
    per-chunk math identical to :func:`_yolo_chunk_gray`."""
    t_pad = gray_u8.shape[0]
    h, w = gray_u8.shape[1:]
    chunks = gray_u8.reshape(t_pad // CHUNK, CHUNK, h, w)
    yolo = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)
    yv = _u8_yolo(yolo_variables)

    def per_chunk(g):
        outs = yolo.apply(yv, _gray_stem_input(yolo_variables, g),
                          train=False)
        has, box, _ = max_conf_detect(outs, h, w, conf)
        return has, box

    has, raw = jax.lax.map(per_chunk, chunks)
    has = has.reshape(t_pad) & (jnp.arange(t_pad) < t_real)
    return gate_scan(has, raw.reshape(t_pad, 4), h, w, params=gate_params)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse"))
def _fused_gated_video(yolo_variables, gray_u8, t_real, conf: float, dtype,
                       gate_params: GateParams, fuse: bool = False):
    """ONE dispatch: whole padded monochrome 256² video -> gated
    (valid (T_pad,), boxes (T_pad, 4)).

    The modular form (``_chunked`` ``_yolo_chunk_gray`` + ``gate_scan``)
    dispatches once per CHUNK plus once for the gate — ~5 relay round-trips
    per 502-frame video where one suffices.  Used by ``_gated``'s monochrome
    fast path (VFT prefix, crop pipeline, eval drivers); bit-identical to
    the modular form on the first ``t_real`` frames (causal scan, identical
    per-chunk detection graph)."""
    return _detect_gate_graph(yolo_variables, gray_u8, t_real, conf, dtype,
                              gate_params, fuse)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "ygvft_params",
                           "fuse"))
def _fused_ygvft_video(yolo_variables, gray_u8, t_real, conf: float, dtype,
                       gate_params: GateParams, ygvft_params: YGVFTParams,
                       fuse: bool = False):
    """ONE dispatch for the whole guided-VFT video (pipeline 2): YOLO chunks
    + gate scan + frame-parallel tracker in a single jitted graph.

    The two-dispatch form (``_gated`` then ``_ygvft_compute``) pays a full
    relay round-trip between the stages for two host pulls that both trace:
    ``valid[:YGVFT_INIT].any()`` and the argmax picking the first seed box.
    Fusing them removes ~40 ms/video of dispatch+fetch latency on the axon
    relay (scripts/perf_probe.py tracker attribution) and lets XLA overlap the YOLO
    pass with the tracker's prefix stages.

    gray_u8: (T_pad, 256, 256) uint8, T_pad a multiple of CHUNK and
    > YGVFT_INIT.  Returns areas (T_pad - YGVFT_INIT,) f32 for the tracked
    frames (callers slice to t_real - YGVFT_INIT and re-offset); padded
    frames emit zero (``active`` tail masking in ygvft_parallel).
    """
    t_pad = gray_u8.shape[0]
    valid, boxes = _detect_gate_graph(yolo_variables, gray_u8, t_real, conf,
                                      dtype, gate_params, fuse)

    g32 = gray_u8.astype(jnp.float32)
    vin = valid[:YGVFT_INIT]
    fi = jnp.argmax(vin)          # first valid index among the init frames
    active = jnp.arange(t_pad - YGVFT_INIT) < (t_real - YGVFT_INIT)
    _, areas = ygvft_parallel(
        g32[:YGVFT_INIT], vin.any(), boxes[fi],
        g32[YGVFT_INIT:], valid[YGVFT_INIT:], boxes[YGVFT_INIT:], active,
        params=ygvft_params)
    return areas


def _detect_gate_multi_graph(yolo_variables, gray_u8, t_real, conf: float,
                             dtype, gate_params: GateParams, fuse: bool):
    """Trace-level detect+gate over a BATCH of padded monochrome videos:
    gray_u8 (K, T_pad, 256, 256) uint8, t_real (K,) i32 -> (valid (K, T_pad),
    boxes (K, T_pad, 4)).  All K·T_pad/CHUNK chunks run through one
    ``lax.map`` (same per-chunk graph as :func:`_detect_gate_graph`), then
    the causal per-video gate scans run under ``vmap`` — per-video results
    bit-identical to :func:`_detect_gate_graph` (per-video t_real masking
    keeps padded frames as misses)."""
    k, t_pad, h, w = gray_u8.shape
    chunks = gray_u8.reshape(k * t_pad // CHUNK, CHUNK, h, w)
    yolo = YOLOv8(nc=1, dtype=dtype, fuse_bn=fuse)
    yv = _u8_yolo(yolo_variables)

    def per_chunk(g):
        outs = yolo.apply(yv, _gray_stem_input(yolo_variables, g),
                          train=False)
        has, box, _ = max_conf_detect(outs, h, w, conf)
        return has, box

    has, raw = jax.lax.map(per_chunk, chunks)
    has = has.reshape(k, t_pad) & (jnp.arange(t_pad)[None] < t_real[:, None])
    raw = raw.reshape(k, t_pad, 4)
    return jax.vmap(
        lambda hh, rr: gate_scan(hh, rr, h, w, params=gate_params))(has, raw)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "fuse"))
def _fused_gated_multi(yolo_variables, gray_u8, t_real, conf: float, dtype,
                       gate_params: GateParams, fuse: bool = False):
    """ONE dispatch: a batch of padded monochrome videos -> gated
    (valid (K, T_pad), boxes (K, T_pad, 4)).  The cohort form of
    :func:`_fused_gated_video`: the ~40 ms/video relay dispatch+fetch
    round-trip is paid once per batch.  Used by the VFT cohort path, whose
    tracker stage must return to host anyway (host-locked crop sizes)."""
    return _detect_gate_multi_graph(yolo_variables, gray_u8, t_real, conf,
                                    dtype, gate_params, fuse)


@_jit_hot(static_argnames=("conf", "dtype", "gate_params", "ygvft_params",
                           "fuse"))
def _fused_ygvft_multi(yolo_variables, gray_u8, t_real, conf: float, dtype,
                       gate_params: GateParams, ygvft_params: YGVFTParams,
                       fuse: bool = False):
    """ONE dispatch for a BATCH of guided-VFT videos (pipeline 2, cohort
    serving): YOLO chunks + per-video gate scans + the batched frame-parallel
    tracker (models/tracker.ygvft_parallel_multi) in a single jitted graph.

    gray_u8: (K, T_pad, 256, 256) uint8 (videos padded to a common bucketed
    length, T_pad > YGVFT_INIT); t_real: (K,) i32.  Returns areas
    (K, T_pad - YGVFT_INIT) f32 for the tracked frames — per-video
    bit-identical to :func:`_fused_ygvft_video` (same detection chunks,
    causal per-video gate scans, per-frame-independent tracker tail; padded
    frames emit zero via per-video ``active`` masking)."""
    k, t_pad = gray_u8.shape[:2]
    valid, boxes = _detect_gate_multi_graph(yolo_variables, gray_u8, t_real,
                                            conf, dtype, gate_params, fuse)
    g32 = gray_u8.astype(jnp.float32)
    vin = valid[:, :YGVFT_INIT]
    fi = jnp.argmax(vin, axis=1)  # first valid index among the init frames
    first_box = jnp.take_along_axis(boxes, fi[:, None, None], axis=1)[:, 0]
    active = (jnp.arange(t_pad - YGVFT_INIT)[None]
              < (t_real - YGVFT_INIT)[:, None])
    return ygvft_parallel_multi(
        g32[:, :YGVFT_INIT], vin.any(axis=1), first_box,
        g32[:, YGVFT_INIT:], valid[:, YGVFT_INIT:], boxes[:, YGVFT_INIT:],
        active, params=ygvft_params)


def is_monochrome(frames_np) -> bool:
    """Host-side check whether a (T, H, W, 3) uint8 video has equal channels
    (checked on first/middle/last frames)."""
    if not isinstance(frames_np, np.ndarray) or frames_np.ndim != 4:
        return False
    t = frames_np.shape[0]
    f = frames_np[[0, t // 2, t - 1]]
    return bool((f[..., 0] == f[..., 1]).all() and (f[..., 1] == f[..., 2]).all())


@_jit_hot(static_argnames=("dtype", "fuse"))
def _crop_unet_chunk(variables, gray_u8, valids, boxes, dtype=jnp.bfloat16,
                     fuse: bool = False):
    """Crop pipeline on a chunk: crop each gated box, letterbox to 256²
    (nearest — the reference letterboxes 2-D arrays with INTER_NEAREST,
    utils.py:80,117), run the crop-trained U-Net, project the mask back into
    the full frame (eval_girafe.py:127-159 fused into two matrix sandwiches).

    gray_u8: (C, H, W); valids: (C,); boxes: (C, 4) i32.
    Returns full-frame boolean masks (C, H, W).
    """
    model = UNet(dtype=dtype, fuse_bn=fuse)
    h, w = gray_u8.shape[1:]
    x1, y1 = boxes[:, 0], boxes[:, 1]
    ch = boxes[:, 3] - boxes[:, 1]
    cw = boxes[:, 2] - boxes[:, 0]
    pad_t, pad_l, c_h, c_w = dyn_letterbox_geometry(ch, cw)

    a_h = jax.vmap(lambda s, l, p, c: dyn_letterbox_matrix_nearest(h, 256, s, l, p, c))(
        y1, ch, pad_t, c_h
    )
    a_w = jax.vmap(lambda s, l, p, c: dyn_letterbox_matrix_nearest(w, 256, s, l, p, c))(
        x1, cw, pad_l, c_w
    )
    g = gray_u8.astype(jnp.float32)
    boxed = jnp.einsum("cih,chw->ciw", a_h, g)
    boxed = jnp.einsum("cjw,ciw->cij", a_w, boxed)

    logits = model.apply(_u8_unet(variables), boxed[..., None], train=False)
    m256 = (logits[..., 0] > 0).astype(jnp.float32)  # sigmoid>0.5

    b_h = jax.vmap(lambda s, l, p, c: dyn_unletterbox_matrix_nearest(h, 256, s, l, p, c))(
        y1, ch, pad_t, c_h
    )
    b_w = jax.vmap(lambda s, l, p, c: dyn_unletterbox_matrix_nearest(w, 256, s, l, p, c))(
        x1, cw, pad_l, c_w
    )
    full = jnp.einsum("chi,cij->chj", b_h, m256)
    full = jnp.einsum("cwj,chj->chw", b_w, full)
    return (full > 0.5) & valids[:, None, None]


@jax.jit
def _box_area_sums(masks, valids, boxes):
    """area[t] = sum(mask inside box) when valid else 0 (features.py:237-245)."""
    h, w = masks.shape[1:]
    rows = jnp.arange(h)
    cols = jnp.arange(w)

    def one(m, v, b):
        rm = (rows >= b[1]) & (rows < b[3])
        cm = (cols >= b[0]) & (cols < b[2])
        return jnp.where(v, (m & rm[:, None] & cm[None, :]).sum().astype(jnp.float32), 0.0)

    return jax.vmap(one)(masks, valids, boxes)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _gather_crops(gray_u8, boxes, out_h: int, out_w: int):
    """Batched crop + INTER_LINEAR resize to the locked VFT crop size,
    rounded to uint8 values (cv2 resizes uint8 crops, features.py:127)."""

    def one(frame, b):
        ch = (b[3] - b[1]).astype(jnp.float32)
        cw = (b[2] - b[0]).astype(jnp.float32)
        c = crop_resize_bilinear(
            frame.astype(jnp.float32), b[1].astype(jnp.float32),
            b[0].astype(jnp.float32), ch, cw, out_h, out_w,
        )
        return jnp.clip(jnp.round(c), 0, 255)

    return jax.vmap(one)(gray_u8, boxes)


@partial(jax.jit, static_argnames=("h0", "w0", "params", "parallel"))
def _fused_vft_tracker(gray_u8, sel, boxes, active, h0: int, w0: int,
                       params: VFTParams, parallel: bool = True):
    """ONE dispatch for the VFT tracker pass: valid-frame crop gather +
    size-locked resize + tracker, jitted together (``_gather_crops`` alone
    would dispatch its ~15 primitives eagerly through the relay).  Keyed on
    the locked crop size (h0, w0) — a genuine static shape, locked host-side
    from the first gated box (features.py:124-127), which is why the VFT
    pipeline is two dispatches rather than one like guided-VFT."""
    crops = _gather_crops(gray_u8[sel], boxes, h0, w0)
    fn = vft_parallel if parallel else vft_scan
    return fn(crops[:VFT_INIT], crops, active, params=params)


class GlottalPipelines:
    """Host-side orchestrator binding model weights to the five pipelines.

    Heavy passes run chunked (CHUNK frames per jitted call — one compile,
    bounded HBM); the gate FSM and feature math consume tiny per-frame
    summaries.
    """

    def __init__(self, unet_variables=None, crop_unet_variables=None,
                 yolo_variables=None, conf: float = 0.25,
                 gate_params: GateParams = GateParams(),
                 vft_params: VFTParams = VFTParams(),
                 ygvft_params: YGVFTParams = YGVFTParams(),
                 dtype=jnp.bfloat16, mesh=None,
                 parallel_trackers: bool = True, fold_bn: bool = True,
                 quant: str | None = None,
                 window_decoder: bool | None = None):
        # inference BatchNorm folding (models/fold.py): scale/shift
        # pre-multiplied into conv weights — one fewer HBM round-trip per
        # conv on TPU, numerics equal up to float reassociation.  Applied
        # only when every provided model still carries batch_stats (training
        # checkpoints); pass fold_bn=False to run the unfolded graphs.
        from openglottal_tpu.models.fold import fold_unet, fold_yolo, is_folded

        provided = [v for v in (unet_variables, crop_unet_variables,
                                yolo_variables) if v is not None]
        if provided and all(is_folded(v) for v in provided):
            self._fuse = True  # already-folded checkpoints drop straight in
        else:
            self._fuse = bool(fold_bn and provided
                              and all("batch_stats" in v for v in provided))
            if self._fuse:
                if unet_variables is not None:
                    unet_variables = fold_unet(unet_variables)
                if crop_unet_variables is not None:
                    crop_unet_variables = fold_unet(crop_unet_variables)
                if yolo_variables is not None:
                    yolo_variables = fold_yolo(yolo_variables)
        self.unet_variables = unet_variables
        self.crop_unet_variables = crop_unet_variables
        self.yolo_variables = yolo_variables
        # gray paths COULD run a kernel-summed 1-channel stem
        # (models/fold.fold_gray_stem); measured on TPU v5e it is ~5% slower
        # than broadcasting the channel on device (the broadcast fuses into
        # the stem conv's input read; a cin=1 conv pads to the same tile),
        # so the gray tree stays identical to the BGR tree — which also keeps
        # gray detection bit-identical to detect_video for equal channels.
        self.yolo_gray_variables = yolo_variables
        self.conf = conf
        self.gate_params = gate_params
        self.vft_params = vft_params
        self.ygvft_params = ygvft_params
        self.dtype = dtype
        self.mesh = mesh
        # frame-parallel tracker formulation (associative scans; bit-matched
        # to the sequential recurrences up to float reassociation, pinned by
        # tests/test_tracker.py) — the production default; the sequential
        # scans remain as the off-fast-path fallback.
        self.parallel_trackers = parallel_trackers
        # opt-in int8 serving mode (models/quant.py): the U-Net in the two
        # hot monochrome whole-video paths runs post-training-quantized
        # (1.5-3.5x faster per conv on TPU v5e, scripts/perf_probe.py int8).
        # Calibration is lazy — the first processed video's frames — or
        # explicit via :meth:`calibrate`.  The default (quant=None) and all
        # eval paths stay bf16, reference-faithful.
        if quant not in (None, "int8", "int8-full"):
            raise ValueError(
                f"quant must be None, 'int8' or 'int8-full', got {quant!r}")
        if quant is not None and not self._fuse:
            raise ValueError("quant needs BN-folded variables "
                             "(provide batch_stats or pre-folded weights)")
        self._quant = quant
        self._qparams = None
        # box-windowed U-Net decoder (both decoder levels) in the fused
        # yolo+unet graphs (_fused_yolo_unet_video_w/_multi_w bf16,
        # _qw int8): 107.75 -> 57.75 ms/video device time when the gate
        # boxes fit the per-chunk union window (trained detectors), with
        # SPECULATIVE per-video ok flags + full-graph redo for the rest
        # (results/PROFILE_r05.md).  Auto: on for folded single-chip paths
        # (the windowed tail runs conv+bias, so it needs folded variables;
        # the mesh path has its own frame-sharded form).
        if window_decoder is None:
            window_decoder = (self._fuse and mesh is None
                              and unet_variables is not None
                              and yolo_variables is not None)
        self._window = bool(window_decoder)
        if mesh is not None:
            # frame-axis ("sequence") sharding: each CHUNK splits over the
            # mesh's data axis; gate/feature scans consume gathered summaries.
            # With a model axis >1 the conv out-channels additionally shard
            # over it (parallel/mesh.shard_model_params — tensor parallelism;
            # GSPMD inserts the collectives); model=1 degenerates to full
            # replication.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from openglottal_tpu.parallel.mesh import shard_model_params

            self._chunk_spec = NamedSharding(mesh, P("data"))
            self._repl_spec = NamedSharding(mesh, P())
            put_p = lambda v: (shard_model_params(mesh, v)
                               if v is not None else None)
            self.unet_variables = put_p(unet_variables)
            self.crop_unet_variables = put_p(crop_unet_variables)
            self.yolo_variables = put_p(yolo_variables)
            self.yolo_gray_variables = self.yolo_variables
        else:
            self._chunk_spec = None

    def calibrate(self, gray_u8):
        """Quantize both models for the int8 serving mode using ``gray_u8``
        ((N, 256, 256) uint8) as the activation-range calibration set.
        Called lazily with the first video's frames if not called up front.
        """
        from openglottal_tpu.models.quant import quantize_unet, quantize_yolo

        g = np.asarray(gray_u8)[:64]
        self._qparams = {"unet": quantize_unet(self.unet_variables, g)}
        if self._quant == "int8-full" and self.yolo_gray_variables is not None:
            cin = self.yolo_gray_variables["params"][
                "ConvBNSiLU_0"]["Conv_0"]["kernel"].shape[2]
            x = g.astype(np.float32)[..., None]
            if cin == 3:
                x = np.broadcast_to(x, x.shape[:3] + (3,))
            self._qparams["yolo"] = quantize_yolo(self.yolo_gray_variables, x)
        self._commit_qparams()
        return self

    def _commit_qparams(self):
        # replicate the quantized kernels over the mesh (same contract as
        # the bf16 variables); act_scales stay host floats (jit constants)
        if self._chunk_spec is not None and self._qparams is not None:
            self._qparams = jax.tree.map(
                lambda a: (jax.device_put(a, self._repl_spec)
                           if hasattr(a, "shape") else a), self._qparams)

    def save_qparams(self, path):
        """Persist the int8 calibration (models/quant.save_qparams) so
        serving numerics do not depend on which video arrived first."""
        from openglottal_tpu.models.quant import save_qparams

        if self._qparams is None:
            raise ValueError("not calibrated yet — call calibrate() first")
        save_qparams(jax.device_get(self._qparams), path)
        return self

    def load_qparams(self, path):
        """Restore a persisted calibration (inverse of :meth:`save_qparams`);
        skips lazy calibration entirely."""
        from openglottal_tpu.models.quant import load_qparams

        if self._quant is None:
            raise ValueError("load_qparams needs quant='int8'/'int8-full'")
        self._qparams = load_qparams(path)
        self._commit_qparams()
        return self

    def _q(self, gray):
        """qparams for the int8 paths, calibrating on ``gray`` if needed."""
        if self._qparams is None:
            self.calibrate(jax.device_get(gray))
        return self._qparams

    # ── chunked model passes ──────────────────────────────────────────────

    def _seg_bucket(self, t: int, base: int = CHUNK) -> int:
        """Padded frame-axis length for one dispatch: a multiple of ``base``
        and, under a mesh, of the data-axis size (sharding divisibility)."""
        b = _bucket(t, base)
        if self.mesh is not None:
            k = self.mesh.shape["data"]
            b += (-b) % k
        return b

    def _seg_put(self, x, t: int, base: int = CHUNK):
        """Pad the frame axis to :meth:`_seg_bucket` and, under a mesh,
        shard it over ``data``."""
        x = _pad_to(x, self._seg_bucket(t, base))
        if self._chunk_spec is not None:
            x = jax.device_put(x, self._chunk_spec)
        return x

    def _chunked(self, fn, *arrays):
        t = arrays[0].shape[0]
        outs = []
        for i in range(0, t, CHUNK):
            chunk = [
                _pad_to(a[i : i + CHUNK], CHUNK) for a in arrays
            ]
            if self._chunk_spec is not None:
                chunk = [jax.device_put(c, self._chunk_spec) for c in chunk]
            outs.append(fn(*chunk))
        if isinstance(outs[0], tuple):
            return tuple(jnp.concatenate([o[k] for o in outs])[:t]
                         for k in range(len(outs[0])))
        return jnp.concatenate(outs)[:t]

    def detect_video(self, frames_bgr_u8):
        """(T, 256, 256, 3) BGR -> (has (T,), raw_boxes (T,4) f32, conf (T,))."""
        return self._chunked(
            lambda x: _yolo_chunk(self.yolo_variables, x, conf=self.conf,
                                  dtype=self.dtype, fuse=self._fuse),
            to_device(frames_bgr_u8),
        )

    def detect_video_gray(self, gray_u8):
        """(T, 256, 256) monochrome -> same as detect_video (channels
        replicated on device; exact for equal-channel sources)."""
        return self._chunked(
            lambda x: _yolo_chunk_gray(self.yolo_gray_variables, x,
                                       conf=self.conf, dtype=self.dtype,
                                       fuse=self._fuse),
            to_device(gray_u8),
        )

    def _prepare(self, frames_bgr_u8):
        """One host->device transfer per video; monochrome videos transfer a
        single channel (3x fewer bytes through the TPU tunnel — the real
        bottleneck; see bench.py).  Returns (frames_dev | None, gray_dev)."""
        from openglottal_tpu.data.video import bgr_to_gray_u8

        if isinstance(frames_bgr_u8, np.ndarray) and is_monochrome(frames_bgr_u8):
            return None, to_device(np.ascontiguousarray(frames_bgr_u8[..., 0]))
        f = to_device(frames_bgr_u8)
        return f, bgr_to_gray_u8(f)

    def prepare(self, frames_bgr_u8):
        """Single host->device transfer for one video.  Returns
        (frames_dev | None, gray_dev); frames_dev is None for monochrome
        sources (only the single channel crosses the tunnel)."""
        return self._prepare(frames_bgr_u8)

    def prepare_prefetched(self, videos, size: int = 2):
        """Double-buffered preparation of a video stream: yields
        ``prepare(video)`` for each item while a background thread transfers
        up to ``size`` videos ahead, overlapping the tunnel-bandwidth-bound
        host->HBM copies with on-chip compute (data/prefetch.py)."""
        from openglottal_tpu.data.prefetch import prefetch_to_device

        return prefetch_to_device(videos, size=size, put=self._prepare)

    def _gated(self, frames_dev, gray_dev, sequential: bool = True):
        h, w = (frames_dev if frames_dev is not None else gray_dev).shape[1:3]
        if (frames_dev is None and sequential and (h, w) == (256, 256)
                and self._chunk_spec is None):
            # monochrome fast path: detect+gate as ONE dispatch (identical
            # per-chunk graph + causal scan — bit-equal on the t prefix)
            t = int(gray_dev.shape[0])
            valid, boxes = _fused_gated_video(
                self.yolo_gray_variables, _pad_to(gray_dev, _bucket(t)),
                jnp.int32(t), conf=self.conf, dtype=self.dtype,
                gate_params=self.gate_params, fuse=self._fuse)
            return valid[:t], boxes[:t]
        if (h, w) != (256, 256):
            # non-native sizes: letterbox to the detector's 256² input and
            # map boxes back (ultralytics letterboxes internally; every
            # reference eval path pre-letterboxes, so this is the rare case)
            from openglottal_tpu.ops.resize import letterbox, letterbox_info

            pt, pl, ch, cw = letterbox_info(h, w, 256)
            scale = max(h, w) / 256.0
            if frames_dev is not None:
                boxed = jnp.stack([
                    letterbox(frames_dev[..., c].astype(jnp.float32), 256,
                              method="linear") for c in range(3)], -1)
                has, raw, _ = self.detect_video(
                    jnp.clip(jnp.round(boxed), 0, 255).astype(jnp.uint8))
            else:
                boxed = letterbox(gray_dev.astype(jnp.float32), 256,
                                  method="linear")
                has, raw, _ = self.detect_video_gray(
                    jnp.clip(jnp.round(boxed), 0, 255).astype(jnp.uint8))
            raw = jnp.stack([
                (raw[:, 0] - pl) * scale, (raw[:, 1] - pt) * scale,
                (raw[:, 2] - pl) * scale, (raw[:, 3] - pt) * scale], -1)
            raw = jnp.clip(raw, 0, jnp.asarray([w, h, w, h], jnp.float32))
        elif frames_dev is not None:
            has, raw, _ = self.detect_video(frames_dev)
        else:
            has, raw, _ = self.detect_video_gray(gray_dev)
        if sequential:
            return gate_scan(has, raw, h, w, params=self.gate_params)
        from openglottal_tpu.models.gate import gate_single

        return gate_single(has, raw, h, w, params=self.gate_params)

    def segment_video(self, gray_u8):
        """(T, H, W) gray -> (T, H, W) boolean masks (full-frame U-Net)."""
        gray = to_device(gray_u8)
        t, h, w = gray.shape
        if (h, w) != (256, 256):
            # reference unet_segment_frame: INTER_LINEAR in and out, threshold
            # applied after projecting the prob map back (utils.py:234-241)
            x = self._chunked(
                lambda g: resize_bilinear(g.astype(jnp.float32), 256, 256), gray
            )
            probs = self._chunked(
                lambda g: _unet_probs_chunk(self.unet_variables, g, self.dtype,
                                            fuse=self._fuse), x
            )
            back = self._chunked(
                lambda p: resize_bilinear(p, h, w), probs
            )
            return back > 0.5
        return self._chunked(
            lambda g: _unet_chunk(self.unet_variables, g, dtype=self.dtype,
                                  fuse=self._fuse), gray
        )

    def gated_boxes(self, frames_bgr_u8, sequential: bool = True):
        """YOLO + temporal gate -> (valid (T,), boxes (T,4) i32)."""
        has, raw, _ = self.detect_video(frames_bgr_u8)
        h, w = frames_bgr_u8.shape[1:3]
        if sequential:
            return gate_scan(has, raw, h, w, params=self.gate_params)
        from openglottal_tpu.models.gate import gate_single

        return gate_single(has, raw, h, w, params=self.gate_params)

    # ── pipelines 3/5: full-frame U-Net ───────────────────────────────────

    def unet_only_areas(self, gray_u8):
        gray = to_device(gray_u8)
        t, h, w = gray.shape
        if (h, w) == (256, 256):
            if self._chunk_spec is not None:
                # mesh: one frame-sharded batched pass (lax.map chunking
                # would serialize the shards)
                if self._quant:
                    masks = _qunet_sharded_chunk(self._q(gray)["unet"],
                                                 self._seg_put(gray, t))
                else:
                    masks = _unet_chunk(self.unet_variables,
                                        self._seg_put(gray, t),
                                        dtype=self.dtype, fuse=self._fuse)
                return masks[:t].sum((1, 2)).astype(jnp.float32)
            if self._quant:
                return _fused_unet_only_video_q(
                    self._q(gray)["unet"], _pad_to(gray, _bucket(t)))[:t]
            return _fused_unet_only_video(
                self.unet_variables, _pad_to(gray, _bucket(t)), self.dtype,
                fuse=self._fuse)[:t]
        masks = self.segment_video(gray)
        return masks.sum((1, 2)).astype(jnp.float32)

    def yolo_unet_areas(self, frames_bgr_u8, gray_u8=None):
        if gray_u8 is not None:
            frames_dev, gray = to_device(frames_bgr_u8), to_device(gray_u8)
        else:
            frames_dev, gray = self._prepare(frames_bgr_u8)
        if frames_dev is None:
            return self.yolo_unet_areas_gray(gray)
        masks = self.segment_video(gray)
        valid, boxes = self._gated(frames_dev, gray)
        return _box_area_sums(masks, valid, boxes)

    def yolo_unet_areas_gray_deferred(self, gray_u8):
        """Dispatch :meth:`yolo_unet_areas_gray` WITHOUT any host sync.

        Returns an opaque pending handle; pass it to
        :meth:`yolo_unet_areas_resolve` when the waveform is needed.  On the
        speculative windowed path this lets a serving loop dispatch video
        j+1 while j computes (the per-video ok check moves into resolve);
        on every other path it degenerates to the plain call."""
        gray = to_device(gray_u8)
        t, h, w = gray.shape
        if ((h, w) == (256, 256) and self._chunk_spec is None
                and self._window):
            if self._quant:
                areas, ok = _fused_yolo_unet_video_qw(
                    self._q(gray), self.yolo_gray_variables,
                    _pad_to(gray, _bucket(t)), jnp.int32(t),
                    conf=self.conf, dtype=self.dtype,
                    gate_params=self.gate_params, fuse=self._fuse)
            else:
                areas, ok = _fused_yolo_unet_video_w(
                    self.unet_variables, self.yolo_gray_variables,
                    _pad_to(gray, _bucket(t)), jnp.int32(t),
                    conf=self.conf, dtype=self.dtype,
                    gate_params=self.gate_params, fuse=self._fuse)
            return (areas[:t], ok, gray, t)
        return (self.yolo_unet_areas_gray(gray), None, gray, t)

    def yolo_unet_areas_resolve(self, pending):
        """Resolve a :meth:`yolo_unet_areas_gray_deferred` handle: checks
        the speculation flag and redoes the rare non-fitting video through
        the full graph."""
        areas, ok, gray, t = pending
        if ok is not None and not bool(ok):
            if self._quant:
                return _fused_yolo_unet_video_q(
                    self._q(gray), self.yolo_gray_variables,
                    _pad_to(gray, _bucket(t)), jnp.int32(t),
                    conf=self.conf, dtype=self.dtype,
                    gate_params=self.gate_params, fuse=self._fuse)[:t]
            return _fused_yolo_unet_video(
                self.unet_variables, self.yolo_gray_variables,
                _pad_to(gray, _bucket(t)), jnp.int32(t),
                conf=self.conf, dtype=self.dtype,
                gate_params=self.gate_params, fuse=self._fuse)[:t]
        return areas

    def yolo_unet_areas_gray(self, gray_u8):
        """YOLO+UNet waveform for monochrome video (T, 256, 256) uint8 —
        the production HSV path: one transfer + one fused dispatch."""
        gray = to_device(gray_u8)
        t, h, w = gray.shape
        if (h, w) == (256, 256):
            if self._chunk_spec is not None:
                if self._quant:
                    return _sharded_yolo_unet_video_q(
                        self._q(gray), self.yolo_gray_variables,
                        self._seg_put(gray, t), jnp.int32(t),
                        conf=self.conf, dtype=self.dtype,
                        gate_params=self.gate_params, fuse=self._fuse)[:t]
                return _sharded_yolo_unet_video(
                    self.unet_variables, self.yolo_gray_variables,
                    self._seg_put(gray, t), jnp.int32(t),
                    conf=self.conf, dtype=self.dtype,
                    gate_params=self.gate_params, fuse=self._fuse)[:t]
            if self._quant:
                if self._window:
                    areas, ok = _fused_yolo_unet_video_qw(
                        self._q(gray), self.yolo_gray_variables,
                        _pad_to(gray, _bucket(t)), jnp.int32(t),
                        conf=self.conf, dtype=self.dtype,
                        gate_params=self.gate_params, fuse=self._fuse)
                    if bool(ok):
                        return areas[:t]
                return _fused_yolo_unet_video_q(
                    self._q(gray), self.yolo_gray_variables,
                    _pad_to(gray, _bucket(t)), jnp.int32(t),
                    conf=self.conf, dtype=self.dtype,
                    gate_params=self.gate_params, fuse=self._fuse)[:t]
            if self._window:
                # speculative windowed-decoder graph: the tiny ok-flag
                # fetch synchronises this video, then the rare non-fitting
                # video (untrained detector, border/oversized glottis box)
                # redoes through the full graph below.  Callers that need
                # dispatch-ahead overlap use the cohort multi API, whose
                # ok checks fold into the fetch loop.
                areas, ok = _fused_yolo_unet_video_w(
                    self.unet_variables, self.yolo_gray_variables,
                    _pad_to(gray, _bucket(t)), jnp.int32(t),
                    conf=self.conf, dtype=self.dtype,
                    gate_params=self.gate_params, fuse=self._fuse)
                if bool(ok):
                    return areas[:t]
            return _fused_yolo_unet_video(
                self.unet_variables, self.yolo_gray_variables,
                _pad_to(gray, _bucket(t)), jnp.int32(t),
                conf=self.conf, dtype=self.dtype,
                gate_params=self.gate_params, fuse=self._fuse)[:t]
        masks = self.segment_video(gray)
        valid, boxes = self._gated(None, gray)
        return _box_area_sums(masks, valid, boxes)

    def _yolo_unet_multi_dispatch(self, grays):
        """Dispatch ONE fused cohort graph for <= MAX_COHORT_K videos;
        returns (areas_dev (K, T_pad) device array, ok, devs, ts) WITHOUT
        fetching — the caller decides when to synchronise.  ``ok`` is None
        (nothing to check) or a per-video (K,) device flag vector from the
        SPECULATIVE windowed graph: videos whose flag comes back False must
        be redone through the per-video path (whose whole-video in-graph
        cond takes the full branch) — that check belongs in the fetch loop
        so the dispatch-ahead overlap is preserved."""
        ts = [int(g.shape[0]) for g in grays]
        t_pad = _bucket(max(ts))
        devs = [to_device(g) for g in grays]
        stacked = jnp.stack([_pad_to(d, t_pad) for d in devs])
        ok = None
        if self._quant:
            # auto-calibration (if still pending) sees a real video, not the
            # zero-padded stack — same content the per-video path would use
            qp = self._q(devs[0])
            if self._window:
                areas, ok = _fused_yolo_unet_multi_qw(
                    qp, self.yolo_gray_variables, stacked,
                    jnp.asarray(ts, jnp.int32), conf=self.conf,
                    dtype=self.dtype, gate_params=self.gate_params,
                    fuse=self._fuse)
            else:
                areas = _fused_yolo_unet_multi_q(
                    qp, self.yolo_gray_variables, stacked,
                    jnp.asarray(ts, jnp.int32), conf=self.conf,
                    dtype=self.dtype, gate_params=self.gate_params,
                    fuse=self._fuse)
        elif self._window:
            areas, ok = _fused_yolo_unet_multi_w(
                self.unet_variables, self.yolo_gray_variables, stacked,
                jnp.asarray(ts, jnp.int32), conf=self.conf, dtype=self.dtype,
                gate_params=self.gate_params, fuse=self._fuse)
        else:
            areas = _fused_yolo_unet_multi(
                self.unet_variables, self.yolo_gray_variables, stacked,
                jnp.asarray(ts, jnp.int32), conf=self.conf, dtype=self.dtype,
                gate_params=self.gate_params, fuse=self._fuse)
        return areas, ok, devs, ts

    def yolo_unet_areas_gray_multi(self, grays, fetch: bool = True,
                                   max_k: int | None = None):
        """YOLO+UNet waveforms for a BATCH of monochrome 256² videos in ONE
        fused dispatch per sub-batch (``_fused_yolo_unet_multi``) — the
        cohort-serving form: the per-dispatch relay round-trip is paid once
        per batch, not per video.  ``grays`` is a sequence of (T_i, 256,
        256) uint8 arrays (host or device); returns a list of (T_i,)
        waveforms, each bit-identical to ``yolo_unet_areas_gray`` on that
        video (same per-chunk graph — ``_yolo_unet_chunk_fn`` — causal
        per-video gate scans, per-video t_real masking).  Videos pad to a
        common bucketed length; the graph compiles once per (K, T_pad)
        shape.  Cohorts larger than :data:`MAX_COHORT_K` split into
        sub-batches, ALL dispatched before the first fetch, so sub-batch
        j+1 streams into the chip while j computes (dispatch-ahead).

        ``fetch=False`` returns per-video DEVICE arrays instead of
        np.float32 hosts: a serving loop can dispatch the next cohort while
        this one computes and fetch (np.asarray) the tiny (T_i,) waveforms
        when it needs them — the protocol bench.py's ``batched_fps_by_k``
        sweep measures.  In the int8 serving mode the batch runs through
        the quantized cohort graph (``_fused_yolo_unet_multi_q``).  Falls
        back to per-video calls under a mesh (that path has its own
        frame-sharded form) or for non-256² frames (per-video letterboxes
        through 256, so the batch must too)."""
        if not grays:
            return []
        if (self._chunk_spec is not None
                or any(tuple(g.shape[1:3]) != (256, 256) for g in grays)):
            outs = [self.yolo_unet_areas_gray(g) for g in grays]
            return [np.asarray(o) for o in outs] if fetch else outs
        k_sub = min(max_k or MAX_COHORT_K, MAX_COHORT_K)
        pending = [self._yolo_unet_multi_dispatch(grays[j:j + k_sub])
                   for j in range(0, len(grays), k_sub)]
        out = []
        for areas, ok, devs, ts in pending:
            # speculation check: the tiny (K,) flag fetch synchronises this
            # sub-batch only after ALL sub-batches are in flight
            ok_np = np.asarray(ok) if ok is not None else None
            if fetch:
                areas = np.asarray(areas)  # one d2h round-trip per sub-batch
            for i, t in enumerate(ts):
                if ok_np is not None and not ok_np[i]:
                    # redo straight through the full one-loop graph (the
                    # speculative result for this video is unusable)
                    if self._quant:
                        a = _fused_yolo_unet_video_q(
                            self._q(devs[i]), self.yolo_gray_variables,
                            _pad_to(devs[i], _bucket(t)), jnp.int32(t),
                            conf=self.conf, dtype=self.dtype,
                            gate_params=self.gate_params, fuse=self._fuse)[:t]
                    else:
                        a = _fused_yolo_unet_video(
                            self.unet_variables, self.yolo_gray_variables,
                            _pad_to(devs[i], _bucket(t)), jnp.int32(t),
                            conf=self.conf, dtype=self.dtype,
                            gate_params=self.gate_params, fuse=self._fuse)[:t]
                    out.append(np.asarray(a) if fetch else a)
                else:
                    out.append(areas[i, :t])
        return out

    # ── pipeline 4: crop U-Net ────────────────────────────────────────────

    def crop_unet_masks(self, frames_bgr_u8, gray_u8=None, valid=None, boxes=None):
        if gray_u8 is not None:
            frames_dev, gray = frames_bgr_u8, to_device(gray_u8)
        else:
            frames_dev, gray = self._prepare(frames_bgr_u8)
        if valid is None:
            valid, boxes = self._gated(frames_dev, gray)
        return self._chunked(
            lambda g, v, b: _crop_unet_chunk(self.crop_unet_variables, g, v, b,
                                             dtype=self.dtype,
                                             fuse=self._fuse),
            gray, valid, boxes,
        ), valid, boxes

    # ── pipeline 1: VFT ───────────────────────────────────────────────────

    def _vft_compute(self, gray, valid, boxes, t, want_masks: bool = False):
        """Shared VFT core: gather size-locked crops for the valid-box frames
        and run ONE tracker pass — frame-parallel (associative-scan) on the
        fast path, sequential ``vft_scan`` fallback.

        Returns (areas (t,) np.float32, crop_masks (n_valid, h0, w0)|None,
        idx valid-frame indices, (h0, w0))."""
        valid_np = np.asarray(valid)
        boxes_np = np.asarray(boxes)
        idx = np.nonzero(valid_np)[0]
        areas = np.zeros(t, np.float32)
        if len(idx) < VFT_INIT + 1:
            return areas, None, idx, (0, 0)
        # crop size locked at first valid crop (features.py:124-127)
        b0 = boxes_np[idx[0]]
        w0, h0 = int(b0[2] - b0[0]), int(b0[3] - b0[1])
        if w0 <= 0 or h0 <= 0:
            return areas, None, idx, (0, 0)
        n = len(idx)
        n_pad = self._seg_bucket(n, 64)
        sel = jnp.asarray(np.pad(idx, (0, n_pad - n), constant_values=idx[-1]))
        boxes_sel = jnp.asarray(
            np.pad(boxes_np[idx], ((0, n_pad - n), (0, 0)), constant_values=1))
        active = jnp.asarray(np.arange(n_pad) >= VFT_INIT) & jnp.asarray(
            np.arange(n_pad) < n
        )
        if self._chunk_spec is not None and self.parallel_trackers:
            # frame-shard the parallel tracker over the mesh (the batched
            # blur/blob/percentile stages partition; the associative lmap
            # prefix and the scalar thresh chain ride XLA collectives)
            crops = jax.device_put(
                _gather_crops(gray[sel], boxes_sel, h0, w0), self._chunk_spec)
            active = jax.device_put(active, self._chunk_spec)
            cmasks, areas_v = vft_parallel(crops[:VFT_INIT], crops, active,
                                           params=self.vft_params)
        else:
            cmasks, areas_v = _fused_vft_tracker(
                gray, sel, boxes_sel, active, h0, w0,
                params=self.vft_params, parallel=self.parallel_trackers)
        areas[idx] = np.asarray(areas_v)[:n]
        areas[idx[:VFT_INIT]] = 0.0  # init frames contribute 0 (features.py:134)
        return areas, (np.asarray(cmasks)[:n] if want_masks else None), idx, (h0, w0)

    def vft_areas(self, frames_bgr_u8):
        """YOLO -> size-locked crops -> one VFT pass (features.py:74-141).

        The tracker consumes only the *valid-box* frames in order (the
        reference skips box-less frames without touching tracker state),
        so we gather valid crops and run one pass over them.
        """
        t = len(frames_bgr_u8)
        if t < VFT_INIT + 5:  # features.py:100-101
            return None
        frames_dev, gray = self._prepare(frames_bgr_u8)
        valid, boxes = self._gated(frames_dev, gray)
        areas, _, _, _ = self._vft_compute(gray, valid, boxes, t)
        return areas

    # ── pipeline 2: guided VFT ────────────────────────────────────────────

    def _ygvft_compute(self, gray, valid, boxes, t, want_masks: bool = False):
        """Shared guided-VFT core: ONE tracker pass (frame-parallel on the
        fast path) -> (areas (t,) np.float32, masks (t, h, w) bool | None).
        The first YGVFT_INIT frames seed the tracker and emit zero/empty
        outputs (features.py:169-181)."""
        h, w = gray.shape[1:3]
        g32 = gray.astype(jnp.float32)
        vnp = np.asarray(valid[:YGVFT_INIT])
        fi = int(np.argmax(vnp)) if vnp.any() else 0
        n = t - YGVFT_INIT
        n_pad = self._seg_bucket(n, 64)
        frames_t = _pad_to(g32[YGVFT_INIT:], n_pad)
        valids_t = _pad_to(valid[YGVFT_INIT:], n_pad)
        boxes_t = _pad_to(boxes[YGVFT_INIT:], n_pad)
        active_t = jnp.arange(n_pad) < n
        if self._chunk_spec is not None and self.parallel_trackers:
            # frame-shard the parallel tracker over the mesh
            frames_t = jax.device_put(frames_t, self._chunk_spec)
            valids_t = jax.device_put(valids_t, self._chunk_spec)
            boxes_t = jax.device_put(boxes_t, self._chunk_spec)
            active_t = jax.device_put(active_t, self._chunk_spec)
        fn = ygvft_parallel if self.parallel_trackers else ygvft_scan
        masks_v, areas_v = fn(
            g32[:YGVFT_INIT], jnp.asarray(bool(vnp.any())), boxes[fi],
            frames_t, valids_t, boxes_t, active_t,
            params=self.ygvft_params)
        areas = np.zeros(t, np.float32)
        areas[YGVFT_INIT:] = np.asarray(areas_v)[:n]
        masks = None
        if want_masks:
            masks = jnp.concatenate(
                [jnp.zeros((YGVFT_INIT, h, w), bool), masks_v[:n]])
        return areas, masks

    def guided_vft_areas(self, frames_bgr_u8):
        """YOLO bbox as ROI on the full frame (features.py:147-196)."""
        t = len(frames_bgr_u8)
        if t < YGVFT_INIT + 2:  # features.py:169-170
            return None
        frames_dev, gray = self._prepare(frames_bgr_u8)
        if frames_dev is None:
            return self.guided_vft_areas_gray(gray)
        valid, boxes = self._gated(frames_dev, gray)
        areas, _ = self._ygvft_compute(gray, valid, boxes, t)
        return areas

    def guided_vft_areas_gray(self, gray_u8):
        """Guided-VFT waveform for monochrome video — ONE fused dispatch
        (detect + gate + frame-parallel tracker in a single jitted graph;
        bit-identical to the two-dispatch path: the only cross-stage values
        are the gate outputs, which trace, and the tracker's padded tail is
        inert).  Falls back to the two-dispatch form for non-256² frames,
        mesh-sharded runs, and the sequential-tracker debug mode."""
        gray = to_device(gray_u8)
        t = int(gray.shape[0])
        if t < YGVFT_INIT + 2:  # features.py:169-170
            return None
        h, w = gray.shape[1:3]
        if ((h, w) == (256, 256) and self._chunk_spec is None
                and self.parallel_trackers):
            areas_v = _fused_ygvft_video(
                self.yolo_gray_variables, _pad_to(gray, _bucket(t)),
                jnp.int32(t), conf=self.conf, dtype=self.dtype,
                gate_params=self.gate_params, ygvft_params=self.ygvft_params,
                fuse=self._fuse)
            areas = np.zeros(t, np.float32)
            areas[YGVFT_INIT:] = np.asarray(areas_v)[:t - YGVFT_INIT]
            return areas
        valid, boxes = self._gated(None, gray)
        areas, _ = self._ygvft_compute(gray, valid, boxes, t)
        return areas

    def guided_vft_areas_gray_multi(self, grays):
        """Guided-VFT waveforms for a BATCH of monochrome 256² videos in ONE
        fused dispatch (``_fused_ygvft_multi``) — the cohort-serving form of
        ``guided_vft_areas_gray``: detection chunks for all videos run
        through one ``lax.map``, gate scans and the tracker's per-video
        pieces under ``vmap``, and the per-dispatch relay round-trip is paid
        once per batch.  ``grays`` is a sequence of (T_i, 256, 256) uint8
        arrays; returns a list of (T_i,) np.float32 waveforms, each
        bit-identical to ``guided_vft_areas_gray`` on that video; videos
        shorter than YGVFT_INIT + 2 yield None (same contract).  Falls back
        to per-video calls under a mesh, the sequential-tracker debug mode,
        or non-256² frames."""
        if not grays:
            return []
        if (self._chunk_spec is not None or not self.parallel_trackers
                or any(tuple(g.shape[1:3]) != (256, 256) for g in grays)):
            return [self.guided_vft_areas_gray(g) for g in grays]
        ts = [int(g.shape[0]) for g in grays]
        run = [i for i, t in enumerate(ts) if t >= YGVFT_INIT + 2]
        out = [None] * len(grays)
        # cohorts above MAX_COHORT_K split into sub-batches (HBM-cliff
        # guard — the tracker tail's fixpoint temporaries scale with K);
        # all sub-batches dispatch before the first fetch (dispatch-ahead)
        pending = []
        for j in range(0, len(run), MAX_COHORT_K):
            sub = run[j:j + MAX_COHORT_K]
            t_pad = _bucket(max(ts[i] for i in sub))
            stacked = jnp.stack(
                [_pad_to(to_device(grays[i]), t_pad) for i in sub])
            pending.append((sub, _fused_ygvft_multi(
                self.yolo_gray_variables, stacked,
                jnp.asarray([ts[i] for i in sub], jnp.int32), conf=self.conf,
                dtype=self.dtype, gate_params=self.gate_params,
                ygvft_params=self.ygvft_params, fuse=self._fuse)))
        for sub, areas_dev in pending:
            areas_v = np.asarray(areas_dev)
            for row, i in enumerate(sub):
                t = ts[i]
                areas = np.zeros(t, np.float32)
                areas[YGVFT_INIT:] = areas_v[row, :t - YGVFT_INIT]
                out[i] = areas
        return out

    def vft_areas_gray(self, gray_u8):
        """VFT waveform for monochrome video (device-resident input OK).
        Two dispatches by construction: the crop size is locked host-side
        from the first gated box (features.py:124-127 — a static shape), so
        the gate outputs must come back to host before the tracker pass."""
        gray = to_device(gray_u8)
        t = int(gray.shape[0])
        if t < VFT_INIT + 5:  # features.py:100-101
            return None
        valid, boxes = self._gated(None, gray)
        return self._vft_compute(gray, valid, boxes, t)[0]

    def vft_areas_gray_multi(self, grays):
        """VFT waveforms for a batch of monochrome 256² videos: ONE fused
        detect+gate dispatch for the whole cohort (``_fused_gated_multi``),
        then per-video tracker passes — the crop size is locked host-side
        from each video's first gated box (a per-video static shape,
        features.py:124-127), so the tracker stage cannot join the batched
        graph the way guided-VFT's does.  Per-video results bit-identical to
        ``vft_areas_gray``; videos shorter than VFT_INIT + 5 yield None."""
        if not grays:
            return []
        if (self._chunk_spec is not None
                or any(tuple(g.shape[1:3]) != (256, 256) for g in grays)):
            return [self.vft_areas_gray(g) for g in grays]
        ts = [int(g.shape[0]) for g in grays]
        run = [i for i, t in enumerate(ts) if t >= VFT_INIT + 5]
        out = [None] * len(grays)
        # MAX_COHORT_K sub-batching as in guided_vft_areas_gray_multi
        for j in range(0, len(run), MAX_COHORT_K):
            sub = run[j:j + MAX_COHORT_K]
            devs = [to_device(grays[i]) for i in sub]
            t_pad = _bucket(max(ts[i] for i in sub))
            stacked = jnp.stack([_pad_to(d, t_pad) for d in devs])
            valid, boxes = _fused_gated_multi(
                self.yolo_gray_variables, stacked,
                jnp.asarray([ts[i] for i in sub], jnp.int32), conf=self.conf,
                dtype=self.dtype, gate_params=self.gate_params,
                fuse=self._fuse)
            for row, i in enumerate(sub):
                t = ts[i]
                out[i] = self._vft_compute(devs[row], valid[row, :t],
                                           boxes[row, :t], t)[0]
        return out

    def ygvft_eval_masks(self, gray, valid, boxes):
        """Masks for the eval ``yolo+motion`` row: (t - YGVFT_INIT, h, w) for
        the non-init frames (eval_girafe.py:176-220 excludes the init frames
        from metrics)."""
        t = gray.shape[0]
        _, masks = self._ygvft_compute(gray, valid, boxes, t, want_masks=True)
        return masks[YGVFT_INIT:]

    # ── full outputs for annotation/inference drivers ─────────────────────

    def run_pipeline_full(self, frames_bgr_u8, pipeline: str):
        """Batched masks + boxes + areas for overlay rendering
        (reference scripts/infer.py:135-265 semantics per pipeline).

        Returns (masks (T,H,W) bool|None, valids (T,) bool|None,
        boxes (T,4) i32|None, areas (T,) f32).
        """
        frames_dev, gray = self._prepare(frames_bgr_u8)
        t, h, w = gray.shape[:3]

        if pipeline == "unet-only":
            masks = self.segment_video(gray)
            return masks, None, None, masks.sum((1, 2)).astype(jnp.float32)

        valid, boxes = self._gated(frames_dev, gray)

        if pipeline == "unet":
            masks = self.segment_video(gray)
            areas = _box_area_sums(masks, valid, boxes)
            # display mask shown full-frame only when a box exists (infer.py:258-262)
            masks = masks & valid[:, None, None]
            return masks, valid, boxes, areas

        if pipeline == "crop-unet":
            # frames_dev may be None (monochrome source) — crop_unet_masks
            # only needs it to gate, and valid/boxes are already gated here
            masks, valid, boxes = self.crop_unet_masks(
                frames_dev, gray_u8=gray, valid=valid, boxes=boxes)
            return masks, valid, boxes, masks.sum((1, 2)).astype(jnp.float32)

        if pipeline == "guided-vft":
            areas_np, masks = self._ygvft_compute(gray, valid, boxes, t,
                                                  want_masks=True)
            return masks, valid, boxes, jnp.asarray(areas_np)

        if pipeline == "vft":
            # project locked-size crop masks back into the frame at the
            # current box (truncating overlap, infer.py:177-181)
            areas_np, cmasks, idx, (h0, w0) = self._vft_compute(
                gray, valid, boxes, t, want_masks=True)
            boxes_np = np.asarray(boxes)
            masks = np.zeros((t, h, w), bool)
            if cmasks is not None:
                for k, fi in enumerate(idx):
                    if k < VFT_INIT:
                        continue
                    x1, y1, x2, y2 = boxes_np[fi]
                    mh = min(h0, y2 - y1)
                    mw = min(w0, x2 - x1)
                    if mh > 0 and mw > 0:
                        masks[fi, y1:y1 + mh, x1:x1 + mw] = cmasks[k][:mh, :mw]
            return jnp.asarray(masks), valid, boxes, jnp.asarray(areas_np)

        raise ValueError(f"unknown pipeline {pipeline!r}")

    # ── feature extraction entry points (reference features.py API) ──────

    # ── streaming (bounded-memory) pipelines ──────────────────────────────

    def stream_areas(self, chunks, pipeline: str = "unet",
                     prefetch: int = 2) -> np.ndarray:
        """Area waveform from a stream of frame chunks, in O(chunk) memory.

        The reference loads whole videos into host RAM (utils.py:43-54);
        this processes arbitrarily long recordings segment by segment:
        ``chunks`` is an iterable of (n, 256, 256[, 3]) uint8 arrays (e.g.
        ``data.video.iter_frames_bgr(path)``), transfers are double-buffered
        ahead of compute, and only the scalar waveform accumulates on host.

        Pipelines: "unet" (YOLO+UNet), "crop-unet", "unet-only", and the
        motion trackers "vft" / "guided-vft".  Every stateless stage is
        per-frame; recurrent state (gate FSM, tracker EMA carries) is carried
        across segment boundaries (gate_scan_carry / *_scan_carry), so
        results are bit-identical to the whole-video paths — for the
        trackers, to the *sequential* whole-video forms
        (``GlottalPipelines(parallel_trackers=False)``; the frame-parallel
        default reassociates float sums across the video, a documented
        ~ulp-level divergence).  Color chunks detect on the real BGR frames
        (like ``detect_video``); monochrome chunks stream a single channel.
        Chunks must be 256² (the whole-video paths letterbox other sizes —
        pre-letterbox before streaming).
        """
        if pipeline in ("vft", "guided-vft"):
            return self._stream_tracker_areas(chunks, pipeline, prefetch)
        if pipeline not in ("unet", "unet-only", "crop-unet"):
            raise ValueError(
                f"unknown streaming pipeline {pipeline!r} (supported: unet, "
                f"crop-unet, unet-only, vft, guided-vft)")
        from openglottal_tpu.data.prefetch import prefetch_to_device
        from openglottal_tpu.models.gate import gate_init, gate_scan_carry

        state = gate_init()
        areas = []
        for frames_dev, gray in prefetch_to_device(chunks, size=prefetch,
                                                   put=self._prepare):
            t_c = int(gray.shape[0])
            if t_c == 0:
                continue
            h, w = _require_256(gray)
            g = self._seg_put(gray, t_c)
            if pipeline == "unet-only":
                if self._chunk_spec is not None:
                    m = _unet_chunk(self.unet_variables, g, dtype=self.dtype,
                                    fuse=self._fuse)
                    areas.append(m[:t_c].sum((1, 2)).astype(jnp.float32))
                    continue
                a = _fused_unet_only_video(self.unet_variables, g, self.dtype,
                                           fuse=self._fuse)
                areas.append(a[:t_c])
                continue
            if pipeline == "crop-unet":
                has, raw = self._stream_detect(frames_dev, g, t_c)
                state, (valid, boxes) = gate_scan_carry(
                    state, has[:t_c], raw[:t_c], h, w,
                    params=self.gate_params)
                masks, _, _ = self.crop_unet_masks(None, gray_u8=gray,
                                                   valid=valid, boxes=boxes)
                areas.append(masks.sum((1, 2)).astype(jnp.float32))
                continue
            if frames_dev is not None or self._chunk_spec is not None:
                # color source: detect on real BGR frames (bit-identical to
                # the whole-video detect_video path), segment on gray.
                # mesh: full-batch sharded passes (no lax.map serialization)
                has, raw = self._stream_detect(frames_dev, g, t_c)
                if self._chunk_spec is not None:
                    masks = _unet_chunk(self.unet_variables, g,
                                        dtype=self.dtype, fuse=self._fuse)
                else:
                    masks = _stream_unet_masks_chunk(self.unet_variables, g,
                                                     dtype=self.dtype,
                                                     fuse=self._fuse)
            else:
                masks, has, raw = _stream_yolo_unet_chunk(
                    self.unet_variables, self.yolo_gray_variables, g,
                    conf=self.conf, dtype=self.dtype, fuse=self._fuse)
            state, (valid, boxes) = gate_scan_carry(
                state, has[:t_c], raw[:t_c], h, w, params=self.gate_params)
            # keep per-segment waveforms on device: converting here would
            # sync each segment and stall the transfer/compute overlap
            areas.append(_box_area_sums(masks[:t_c], valid, boxes))
        if not areas:
            return np.zeros((0,), np.float32)
        return np.concatenate([np.asarray(a) for a in areas])

    def _stream_detect(self, frames_dev, g_pad, t_c: int):
        """Per-segment raw detections (has, raw) on the padded frame axis;
        color segments detect on the real BGR frames like ``detect_video``.
        Under a mesh the full-batch (sharded) chunk fns run instead of the
        lax.map forms, which would serialize the shards."""
        if frames_dev is not None:
            if self._chunk_spec is not None:
                has, raw, _ = _yolo_chunk(
                    self.yolo_variables, self._seg_put(frames_dev, t_c),
                    conf=self.conf, dtype=self.dtype, fuse=self._fuse)
                return has, raw
            return _stream_yolo_chunk_bgr(
                self.yolo_variables, _pad_to(frames_dev, _bucket(t_c)),
                conf=self.conf, dtype=self.dtype, fuse=self._fuse)
        if self._chunk_spec is not None:
            has, raw, _ = _yolo_chunk_gray(self.yolo_gray_variables, g_pad,
                                           conf=self.conf, dtype=self.dtype,
                                           fuse=self._fuse)
            return has, raw
        return _stream_yolo_chunk(self.yolo_gray_variables, g_pad,
                                  conf=self.conf, dtype=self.dtype,
                                  fuse=self._fuse)

    def _stream_tracker_areas(self, chunks, pipeline: str,
                              prefetch: int) -> np.ndarray:
        """Streaming motion trackers via the segment-resumable sequential
        scans (models/tracker.vft_scan_carry / ygvft_scan_carry) — the
        tracker analog of gate_scan_carry.  Bit-identical to the sequential
        whole-video forms; the reference has no streaming at all
        (utils.py:43-54 loads whole videos into RAM).

        vft: the crop size locks at the FIRST gated box ever seen
        (features.py:124-127); the first VFT_INIT valid crops seed the
        tracker and contribute zero area; box-less frames pass no state.
        guided-vft: the first YGVFT_INIT frames seed the tracker
        (features.py:169-181) and contribute zero area.
        """
        from openglottal_tpu.data.prefetch import prefetch_to_device
        from openglottal_tpu.models.gate import gate_init, gate_scan_carry

        vft = pipeline == "vft"
        state = gate_init()
        carry = None
        lock: tuple | str | None = None   # vft crop size (h0, w0) | "dead"
        init_crops: list = []             # vft: first VFT_INIT valid crops
        init_frames: list = []            # ygvft: first YGVFT_INIT frames
        init_meta: list = []              # ygvft: their (valid, box)
        areas: list = []
        for frames_dev, gray in prefetch_to_device(chunks, size=prefetch,
                                                   put=self._prepare):
            t_c = int(gray.shape[0])
            if t_c == 0:
                continue
            h, w = _require_256(gray)
            g = self._seg_put(gray, t_c)
            has, raw = self._stream_detect(frames_dev, g, t_c)
            state, (valid, boxes) = gate_scan_carry(
                state, has[:t_c], raw[:t_c], h, w, params=self.gate_params)
            a_seg = np.zeros(t_c, np.float32)
            if vft:
                vnp = np.asarray(valid)
                bnp = np.asarray(boxes)
                idx = np.nonzero(vnp)[0]
                if lock is None and idx.size:
                    b0 = bnp[idx[0]]
                    w0, h0 = int(b0[2] - b0[0]), int(b0[3] - b0[1])
                    lock = (h0, w0) if (w0 > 0 and h0 > 0) else "dead"
                if idx.size == 0 or lock in (None, "dead"):
                    areas.append(a_seg)
                    continue
                h0, w0 = lock
                n = len(idx)
                n_pad = _bucket(n, 64)
                sel = jnp.asarray(np.pad(idx, (0, n_pad - n),
                                         constant_values=idx[-1]))
                crops = _gather_crops(gray[sel], jnp.asarray(
                    np.pad(bnp[idx], ((0, n_pad - n), (0, 0)),
                           constant_values=1)), h0, w0)
                k = 0
                if carry is None:
                    take = min(VFT_INIT - len(init_crops), n)
                    init_crops.extend(crops[j] for j in range(take))
                    k = take
                    if len(init_crops) == VFT_INIT:
                        carry = _vft_init_jit(jnp.stack(init_crops),
                                              p=self.vft_params)
                if carry is not None and k < n:
                    m = n - k
                    m_pad = _bucket(m, 64)
                    seg = _pad_to(crops[k:k + m], m_pad)
                    act = jnp.asarray(np.arange(m_pad) < m)
                    carry, (_, areas_v) = vft_scan_carry(
                        carry, seg, act, params=self.vft_params)
                    a_seg[idx[k:]] = np.asarray(areas_v)[:m]
                areas.append(a_seg)
                continue
            # guided-vft
            g32 = gray.astype(jnp.float32)
            start = 0
            if carry is None:
                take = min(YGVFT_INIT - len(init_frames), t_c)
                init_frames.extend(g32[j] for j in range(take))
                init_meta.extend((valid[j], boxes[j]) for j in range(take))
                start = take
                if len(init_frames) == YGVFT_INIT:
                    vnp = np.asarray(jnp.stack([v for v, _ in init_meta]))
                    fi = int(np.argmax(vnp)) if vnp.any() else 0
                    carry = _ygvft_init_jit(
                        jnp.stack(init_frames), jnp.asarray(bool(vnp.any())),
                        init_meta[fi][1], p=self.ygvft_params)
            if carry is not None and start < t_c:
                m = t_c - start
                m_pad = _bucket(m, 64)
                act = jnp.asarray(np.arange(m_pad) < m)
                carry, (_, areas_v) = ygvft_scan_carry(
                    carry, _pad_to(g32[start:], m_pad),
                    _pad_to(valid[start:], m_pad),
                    _pad_to(boxes[start:], m_pad), act,
                    params=self.ygvft_params)
                a_seg[start:] = np.asarray(areas_v)[:m]
            areas.append(a_seg)
        if not areas:
            return np.zeros((0,), np.float32)
        return np.concatenate(areas)

    def stream_features(self, chunks, pipeline: str = "unet"):
        """Kinematic features from a chunk stream; None on empty or silent
        waveforms (reference cli semantics)."""
        areas = self.stream_areas(chunks, pipeline)
        if areas.size == 0:
            return None
        return kinematic_features(areas)

    def extract_features(self, frames_bgr_u8, pipeline: str):
        """Reference features.py API over host frames; each pipeline does its
        own single (monochrome-aware) host->device transfer."""
        if len(frames_bgr_u8) == 0:
            return None
        if pipeline == "vft":
            areas = self.vft_areas(frames_bgr_u8)
        elif pipeline == "guided-vft":
            areas = self.guided_vft_areas(frames_bgr_u8)
        elif pipeline == "unet":
            areas = np.asarray(self.yolo_unet_areas(frames_bgr_u8))
        elif pipeline == "unet-only":
            _, gray = self._prepare(frames_bgr_u8)
            areas = np.asarray(self.unet_only_areas(gray))
        elif pipeline == "crop-unet":
            masks, valid, boxes = self.crop_unet_masks(frames_bgr_u8)
            areas = np.asarray(_box_area_sums(masks, valid, boxes))
        else:
            raise ValueError(f"unknown pipeline {pipeline!r}")
        if areas is None:
            return None
        return kinematic_features(areas)


@_jit_hot(static_argnames=("dtype", "fuse"))
def _unet_probs_chunk(variables, gray01_256, dtype=jnp.bfloat16,
                      fuse: bool = False):
    """U-Net probabilities on already-resized (C, 256, 256) float frames
    (pixel range 0..255)."""
    model = UNet(dtype=dtype, fuse_bn=fuse)
    x = gray01_256.astype(jnp.float32)[..., None]
    logits = model.apply(_u8_unet(variables), x, train=False)
    return jax.nn.sigmoid(logits[..., 0])
