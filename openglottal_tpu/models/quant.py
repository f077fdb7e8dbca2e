"""Post-training int8 quantization of the U-Net inference path.

Why: the round-3 device-trace attribution (results/PROFILE_r03.md) shows the
fused YOLO+UNet video graph is split between MXU-bound mid layers and
HBM-bandwidth-floor 256² layers.  int8 attacks both at once on TPU v5e: the
MXU runs s8xs8->s32 at 2x the bf16 rate (394 vs 197 TOPS peak) and int8
activations halve the bytes of every bandwidth-bound layer.  Measured on the
dominant 256² 32->32 shape: 1.85x over bf16 (scripts/perf_probe.py int8, chained
fori so XLA can neither elide nor hoist iterations).

Scheme (standard symmetric PTQ):
  * weights: per-OUTPUT-CHANNEL symmetric int8, sw[c] = max|w[..., c]| / 127;
  * activations: per-tensor symmetric int8, sx calibrated as max|x| over a
    calibration batch run through the bf16 model (pct=100 default — the
    strongest drop-in fidelity on the trained selftest model: 0.99994 mask
    agreement, Dice delta -0.0004; percentile clipping (e.g. pct=99.97)
    measured HIGHER Dice on the synthetic domain (+0.065, accidental
    regularization) but diverges from the bf16 model — a serving mode
    should reproduce it, so clipping stays opt-in);
  * layer: y = conv(x8, w8) -> s32, then the f32 epilogue
    y*(sx*sw[c]) + b -> ReLU -> requantize round(y/sx_next) -> int8 (XLA
    fuses the epilogue into the conv);
  * decoder skip concat: each skip and its upsample CALIBRATE TO ONE SHARED
    scale (quantize_unet), so the concat is scale-consistent and the concat
    conv is a single fused int8 conv.  (The split-conv alternative —
    conv(s8, k_s)*(ss*sw) + conv(u8, k_u)*(su*sw), exact per-operand scales
    — made XLA materialize a full s32 partial to HBM at every decoder
    level: 1.07 GB write+read per 256² chunk, ~17 ms/video slower.);
  * max-pool commutes with (monotone) quantization — pooled int8 directly;
  * the stem conv (1->32, reads uint8 pixels) and the 2x2 ConvTranspose
    upsamplers stay bf16 (tiny FLOP share; the stem's 0..255 input does not
    fit int8 and zero-padding would break a shifted encoding) — their
    OUTPUTS are quantized so every 3x3 conv runs int8.  An int8
    GEMM+depth-to-space upsampler (DepthToSpaceUp packing, per-column
    scales) was measured SLOWER at full-pipeline level (5.7k vs 7.1k fps
    pipelined) — the depth-to-space transpose is an extra full-tensor HBM
    pass, the same lesson as the bf16 d2s option (models/unet.py);
  * the 1x1 logits head consumes the last int8 activation and produces f32
    logits; masks = logits > 0 exactly as the bf16 path.

This is an OPT-IN serving mode (GlottalPipelines(quant="int8")): the
default path stays bf16, reference-faithful.  Accuracy is gated by
tests/test_quant.py (layer fidelity + mask agreement) and the TPU selftest
(Dice delta of a trained model, scripts/selftest_e2e.py).

Reference context: the reference runs fp32/fp16 torch inference
(openglottal/utils.py:218-241); quantized serving has no upstream
counterpart — it is a beyond-reference deployment feature.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, k, out_dtype, pad=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad)] * 2, dimension_numbers=dn,
        preferred_element_type=out_dtype)


def _convT(x, k, out_dtype):
    """2x2 stride-2 transposed conv (flax ConvTranspose lowering)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_transpose(
        x, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def quantize_weights(kernel: np.ndarray):
    """Per-output-channel symmetric int8: returns (w8, sw) with
    w8[..., c] = round(w[..., c] / sw[c]), sw[c] = max|w[..., c]| / 127."""
    k = np.asarray(kernel, np.float32)
    sw = np.abs(k).reshape(-1, k.shape[-1]).max(0) / 127.0
    sw = np.where(sw == 0, 1.0, sw).astype(np.float32)
    w8 = np.clip(np.round(k / sw), -127, 127).astype(np.int8)
    return w8, sw


def _q(x, scale):
    """f32 -> int8 at per-tensor ``scale``."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _names():
    """(encoder DoubleConvs, bottleneck, decoder DoubleConvs, upsamplers)."""
    enc = [f"DoubleConv_{i}" for i in range(4)]
    dec = [f"DoubleConv_{i}" for i in range(5, 9)]
    ups = [f"ConvTranspose_{i}" for i in range(4)]
    return enc, "DoubleConv_4", dec, ups


def quantize_unet(variables: dict, calib_gray_u8, pct: float = 100.0):
    """Post-training quantization of FOLDED U-Net variables.

    variables: a ``fold_unet``-folded tree (Conv kernels carry biases; no
    BatchNorm).  calib_gray_u8: (N, 256, 256) uint8 calibration frames run
    through the bf16 model to record per-activation ranges.  Returns a
    qparams dict consumed by :func:`qunet_chunk_masks`.
    """
    from openglottal_tpu.models.fold import is_folded

    if not is_folded(variables):
        raise ValueError("quantize_unet expects fold_unet-folded variables")
    params = variables["params"]
    enc, bneck, dec, ups = _names()

    # ── calibration: per-activation high-percentile |x| from the bf16 model
    # (intermediate taps re-created by running the same structure; the
    # percentiles reduce ON DEVICE in one jitted pass — only scalars cross
    # the host link) ───────────────────────────────────────────────────────
    acts = jax.jit(_bf16_taps, static_argnames=("pct",))(
        variables, jnp.asarray(calib_gray_u8), pct=pct)
    scales = {name: float(v) / 127.0 for name, v in acts.items()}
    scales = {k: (v if v > 0 else 1.0) for k, v in scales.items()}
    # decoder concat: pin each skip (enc{3-i}_out) and its upsample (up{i})
    # to a COMMON scale so the concatenation is scale-consistent and the
    # concat conv runs as ONE fused int8 conv — the split form materialized
    # a full s32 partial to HBM at every decoder level (int8 trace: 1.07 GB
    # write + read per 256² chunk).  Cost: the smaller-ranged of the two
    # tensors quantizes one bit coarser.
    for i in range(4):
        sc = max(scales[f"enc{3 - i}_out"], scales[f"up{i}"])
        scales[f"enc{3 - i}_out"] = sc
        scales[f"up{i}"] = sc

    q: dict[str, Any] = {"act_scales": scales}

    def q_dc(name):
        node = params[name]
        out = {}
        for conv in ("Conv_0", "Conv_1"):
            w8, sw = quantize_weights(node[conv]["kernel"])
            out[conv] = {"w8": jnp.asarray(w8), "sw": jnp.asarray(sw),
                         "b": jnp.asarray(node[conv]["bias"], jnp.float32)}
        return out

    for name in enc + [bneck] + dec:
        q[name] = q_dc(name)
    for name in ups:  # bf16 upsamplers (tiny FLOP share)
        q[name] = {"kernel": jnp.asarray(params[name]["kernel"],
                                         jnp.bfloat16),
                   "bias": jnp.asarray(params[name]["bias"], jnp.bfloat16)}
    # bf16 stem (uint8 input does not fit int8; bandwidth-floor-bound anyway)
    q["stem_bf16"] = {
        "kernel": jnp.asarray(params[enc[0]]["Conv_0"]["kernel"],
                              jnp.bfloat16),
        "bias": jnp.asarray(params[enc[0]]["Conv_0"]["bias"], jnp.bfloat16)}
    q["head"] = {"kernel": jnp.asarray(params["Conv_0"]["kernel"],
                                       jnp.float32),
                 "bias": jnp.asarray(params["Conv_0"]["bias"], jnp.float32)}
    return q


def _tap_names():
    """Activation tap points needing a calibrated scale: the int8 INPUT of
    every quantized conv."""
    names = []
    for i in range(4):
        names.append(f"enc{i}_mid")    # after DoubleConv_i Conv_0+ReLU
        names.append(f"enc{i}_out")    # after Conv_1+ReLU (skip / pooled)
    names += ["bneck_mid", "bneck_out"]
    for i in range(4):
        names.append(f"up{i}")         # ConvTranspose_i output (pre-concat)
        names.append(f"dec{i}_mid")
        names.append(f"dec{i}_out")
    return names


def _bf16_taps(variables, gray_u8, pct: float = 100.0):
    """Run the folded bf16 U-Net on calibration frames, returning the
    ``pct``-percentile of |activation| at every tap listed by
    :func:`_tap_names` (scalars — jit-friendly, nothing big leaves HBM)."""
    params = variables["params"]
    enc, bneck, dec, ups = _names()
    x = (gray_u8.astype(jnp.float32) / 255.0)[..., None].astype(jnp.bfloat16)
    taps = {}

    def tap(name, a):
        taps[name] = jnp.percentile(
            jnp.abs(a.astype(jnp.float32)).reshape(-1), pct)

    def dc(name, x, tag):
        for j, conv in enumerate(("Conv_0", "Conv_1")):
            k = jnp.asarray(params[name][conv]["kernel"], jnp.bfloat16)
            b = jnp.asarray(params[name][conv]["bias"], jnp.bfloat16)
            x = jax.nn.relu(_conv(x, k, jnp.bfloat16) + b)
            tap(f"{tag}_{'mid' if j == 0 else 'out'}", x)
        return x

    skips = []
    for i, name in enumerate(enc):
        x = dc(name, x, f"enc{i}")
        skips.append(x)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
    x = dc(bneck, x, "bneck")
    for i, (name, up) in enumerate(zip(dec, ups)):
        k = jnp.asarray(params[up]["kernel"], jnp.bfloat16)
        b = jnp.asarray(params[up]["bias"], jnp.bfloat16)
        x = _convT(x, k, jnp.bfloat16) + b
        tap(f"up{i}", x)
        s = skips.pop()
        x = jnp.concatenate([s, x], axis=-1)
        x = dc(name, x, f"dec{i}")
    return taps


def qunet_masks(qparams, gray_u8):
    """int8 U-Net forward on a chunk of 256² grayscale frames -> boolean
    masks (plain traceable function — embedded by the fused whole-video
    pipeline graphs; :func:`qunet_chunk_masks` is the jitted form).

    Mirrors pipelines._unet_chunk exactly in structure; every 3x3 conv runs
    s8xs8->s32 on the MXU with the dequant+bias+ReLU+requant epilogue fused
    by XLA.  Decoder concat convs run SPLIT (two int8 convs, one per input
    scale).
    """
    s = qparams["act_scales"]
    enc, bneck, dec, ups = _names()

    # bf16 stem: uint8 -> 32ch, output quantized to int8
    xb = gray_u8.astype(jnp.bfloat16)[..., None]
    stem = qparams["stem_bf16"]
    y = jax.nn.relu(
        _conv(xb, stem["kernel"] * jnp.bfloat16(1.0 / 255.0), jnp.bfloat16)
        + stem["bias"])
    x8 = _q(y.astype(jnp.float32), s["enc0_mid"])

    def qconv(x8, layer, sx, pad=1):
        acc = _conv(x8, layer["w8"], jnp.int32, pad=pad)
        return acc.astype(jnp.float32) * (sx * layer["sw"]) + layer["b"]

    def qconv_relu_q(x8, layer, sx, s_next):
        return _q(jax.nn.relu(qconv(x8, layer, sx)), s_next)

    skips = []
    sx = s["enc0_mid"]
    for i, name in enumerate(enc):
        if i > 0:
            x8 = qconv_relu_q(x8, qparams[name]["Conv_0"], sx,
                              s[f"enc{i}_mid"])
            sx = s[f"enc{i}_mid"]
        x8 = qconv_relu_q(x8, qparams[name]["Conv_1"], sx, s[f"enc{i}_out"])
        sx = s[f"enc{i}_out"]
        skips.append((x8, sx))
        x8 = jax.lax.reduce_window(x8, jnp.int8(-128), jax.lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    x8 = qconv_relu_q(x8, qparams[bneck]["Conv_0"], sx, s["bneck_mid"])
    x8 = qconv_relu_q(x8, qparams[bneck]["Conv_1"], s["bneck_mid"],
                      s["bneck_out"])
    sx = s["bneck_out"]

    for i, (name, up) in enumerate(zip(dec, ups)):
        # bf16 upsample of the dequantized activation, requantized
        xb = x8.astype(jnp.bfloat16) * jnp.bfloat16(sx)
        u = _convT(xb, qparams[up]["kernel"], jnp.bfloat16) \
            + qparams[up]["bias"]
        u8 = _q(u.astype(jnp.float32), s[f"up{i}"])
        s8, ss = skips.pop()
        # skip and upsample share one calibrated scale (quantize_unet pins
        # ss == s[f"up{i}"]), so the concat is scale-consistent and the
        # concat conv is ONE fused int8 conv — the split form (conv(s, k_s)
        # + conv(u, k_u)) made XLA materialize a full s32 partial to HBM
        x8 = qconv_relu_q(jnp.concatenate([s8, u8], axis=-1),
                          qparams[name]["Conv_0"], s[f"up{i}"],
                          s[f"dec{i}_mid"])
        x8 = qconv_relu_q(x8, qparams[name]["Conv_1"], s[f"dec{i}_mid"],
                          s[f"dec{i}_out"])
        sx = s[f"dec{i}_out"]

    head = qparams["head"]
    xf = x8.astype(jnp.float32) * sx
    logits = _conv(xf, head["kernel"], jnp.float32, pad=0) + head["bias"]
    return logits[..., 0] > 0  # sigmoid>0.5


@jax.jit
def qunet_chunk_masks(qparams, gray_u8):
    """Jitted :func:`qunet_masks` (drop-in for pipelines._unet_chunk)."""
    return qunet_masks(qparams, gray_u8)


# ── split int8 forward + box-windowed decoder (mirrors models/unet.py's
# unet_apply_to_d3 / unet_mid_window / unet_tail_window_chunk — see
# results/PROFILE_r05.md).  The int8 3x3 convs accumulate in s32 (exact
# under retiling), but the bf16 UPSAMPLE dequant→ConvTranspose is a
# bf16 channel contraction whose accumulation order XLA retiles per shape:
# on TPU the windowed form flips near-zero logits exactly like the bf16
# path (on CPU the lowering happens to match bit-for-bit —
# tests/test_quant_window.py pins that; the selftest windowed_rel_l1 gate
# bounds the waveform effect).  Used by the quantized two-pass fused
# graphs (pipelines._fused_yolo_unet_video_qw). ──────────────────────────


def _qconv(x8, layer, sx, pad=1):
    acc = _conv(x8, layer["w8"], jnp.int32, pad=pad)
    return acc.astype(jnp.float32) * (sx * layer["sw"]) + layer["b"]


def _qconv_relu_q(x8, layer, sx, s_next, pad=1):
    return _q(jax.nn.relu(_qconv(x8, layer, sx, pad=pad)), s_next)


def qunet_to_d3(qparams, gray_u8):
    """The shared prefix of :func:`qunet_masks` through the 64²-level
    decoder block (dec index 1): returns (x8_d3, skip1_(x8), skip2_(x8)).
    Scales are implicit in ``qparams`` (skips are pinned to s["up{i}"] by
    calibration)."""
    s = qparams["act_scales"]
    enc, bneck, dec, ups = _names()

    xb = gray_u8.astype(jnp.bfloat16)[..., None]
    stem = qparams["stem_bf16"]
    y = jax.nn.relu(
        _conv(xb, stem["kernel"] * jnp.bfloat16(1.0 / 255.0), jnp.bfloat16)
        + stem["bias"])
    x8 = _q(y.astype(jnp.float32), s["enc0_mid"])

    skips = []
    sx = s["enc0_mid"]
    for i, name in enumerate(enc):
        if i > 0:
            x8 = _qconv_relu_q(x8, qparams[name]["Conv_0"], sx,
                               s[f"enc{i}_mid"])
            sx = s[f"enc{i}_mid"]
        x8 = _qconv_relu_q(x8, qparams[name]["Conv_1"], sx, s[f"enc{i}_out"])
        sx = s[f"enc{i}_out"]
        skips.append((x8, sx))
        x8 = jax.lax.reduce_window(x8, jnp.int8(-128), jax.lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    x8 = _qconv_relu_q(x8, qparams[bneck]["Conv_0"], sx, s["bneck_mid"])
    x8 = _qconv_relu_q(x8, qparams[bneck]["Conv_1"], s["bneck_mid"],
                       s["bneck_out"])
    sx = s["bneck_out"]

    for i in range(2):  # decoder levels at 32² and 64²
        name, up = dec[i], ups[i]
        xb = x8.astype(jnp.bfloat16) * jnp.bfloat16(sx)
        u = _convT(xb, qparams[up]["kernel"], jnp.bfloat16) \
            + qparams[up]["bias"]
        u8 = _q(u.astype(jnp.float32), s[f"up{i}"])
        s8, _ = skips.pop()
        x8 = _qconv_relu_q(jnp.concatenate([s8, u8], axis=-1),
                           qparams[name]["Conv_0"], s[f"up{i}"],
                           s[f"dec{i}_mid"])
        x8 = _qconv_relu_q(x8, qparams[name]["Conv_1"], s[f"dec{i}_mid"],
                           s[f"dec{i}_out"])
        sx = s[f"dec{i}_out"]

    (skip1, _), (skip2, _) = skips[0], skips[1]
    return x8, skip1, skip2


def _qup(qparams, x8, sx_in, i):
    """bf16 dequant -> 2x2 stride-2 transposed conv -> requant (decoder
    level i)."""
    s = qparams["act_scales"]
    _, _, _, ups = _names()
    xb = x8.astype(jnp.bfloat16) * jnp.bfloat16(sx_in)
    u = _convT(xb, qparams[ups[i]]["kernel"], jnp.bfloat16) \
        + qparams[ups[i]]["bias"]
    return _q(u.astype(jnp.float32), s[f"up{i}"])


def qunet_tail_from_d3_full(qparams, x8_d3, skip1, skip2):
    """Full-frame decoder levels 2-3 + head from the d3 split point;
    (qunet_to_d3 ∘ this) == qunet_masks bit-for-bit."""
    s = qparams["act_scales"]
    _, _, dec, _ = _names()
    x8 = x8_d3
    sx = s["dec1_out"]
    for i, s8 in ((2, skip2), (3, skip1)):
        u8 = _qup(qparams, x8, sx, i)
        x8 = _qconv_relu_q(jnp.concatenate([s8, u8], axis=-1),
                           qparams[dec[i]]["Conv_0"], s[f"up{i}"],
                           s[f"dec{i}_mid"])
        x8 = _qconv_relu_q(x8, qparams[dec[i]]["Conv_1"], s[f"dec{i}_mid"],
                           s[f"dec{i}_out"])
        sx = s[f"dec{i}_out"]
    head = qparams["head"]
    xf = x8.astype(jnp.float32) * sx
    logits = _conv(xf, head["kernel"], jnp.float32, pad=0) + head["bias"]
    return logits[..., 0]


def qunet_tail_from_d3_window(qparams, x8_d3, skip1, skip2, oy, ox,
                              win: int = 160):
    """Windowed decoder levels 2-3 + head: logits on the (win, win) window
    at scalar even origin (oy, ox) with oy ≡ 2 (mod 4) and 6-px interior
    margins (models/unet.chunk_window_origin lattice=4/margin=6).  The
    int8 valid convs on real-halo slices are BIT-identical to the
    full-frame pass's window values (s32 integer accumulation)."""
    s = qparams["act_scales"]
    _, _, dec, _ = _names()
    mw = win // 2 + 6
    m0y, m0x = oy // 2 - 3, ox // 2 - 3

    d3w = jax.lax.dynamic_slice(
        x8_d3, (0, m0y // 2, m0x // 2, 0),
        (x8_d3.shape[0], mw // 2, mw // 2, x8_d3.shape[-1]))
    u8 = _qup(qparams, d3w, s["dec1_out"], 2)             # (N, mw, mw)
    s2w = jax.lax.dynamic_slice(
        skip2, (0, m0y, m0x, 0), (skip2.shape[0], mw, mw, skip2.shape[-1]))
    x8 = _qconv_relu_q(jnp.concatenate([s2w, u8], axis=-1),
                       qparams[dec[2]]["Conv_0"], s["up2"], s["dec2_mid"],
                       pad=0)                             # mw-2
    x8 = _qconv_relu_q(x8, qparams[dec[2]]["Conv_1"], s["dec2_mid"],
                       s["dec2_out"], pad=0)              # win/2 + 2

    wh = win + 4
    u8 = _qup(qparams, x8, s["dec2_out"], 3)              # (N, wh, wh)
    s1w = jax.lax.dynamic_slice(
        skip1, (0, oy - 2, ox - 2, 0),
        (skip1.shape[0], wh, wh, skip1.shape[-1]))
    x8 = _qconv_relu_q(jnp.concatenate([s1w, u8], axis=-1),
                       qparams[dec[3]]["Conv_0"], s["up3"], s["dec3_mid"],
                       pad=0)                             # win + 2
    x8 = _qconv_relu_q(x8, qparams[dec[3]]["Conv_1"], s["dec3_mid"],
                       s["dec3_out"], pad=0)              # win
    head = qparams["head"]
    xf = x8.astype(jnp.float32) * s["dec3_out"]
    logits = _conv(xf, head["kernel"], jnp.float32, pad=0) + head["bias"]
    return logits[..., 0]


# ── YOLOv8n int8 ─────────────────────────────────────────────────────────
#
# Same PTQ scheme as the U-Net, mirroring models/yolo.YOLOv8 exactly.  One
# structural walker (_yolo_walk) runs BOTH the bf16 calibration pass
# (recording per-tap |x| percentiles) and the int8 forward — single source
# of truth for the wiring.  Concat operands must share a scale for the
# concat conv to stay one fused int8 conv, so calibration pins:
#   * inside each C2f: cv1's split halves + every bottleneck output;
#   * the two FPN groups {sppf, x6, cbs6} and {x12, x4, cbs5}
#     (jnp.repeat upsampling and max-pool preserve scales).
# The P1 stem (raw 0..255 input) stays bf16 with a quantized output; the
# detect head's final 1x1 convs emit f32 logits unchanged.

class _YoloWalk:
    """Structural walker over the folded YOLOv8n params.

    mode="calib": activations are bf16 tensors; records taps[name] =
    pct-percentile of |x|.  mode="int8": activations are int8 tensors with
    per-tensor scales from qparams["act_scales"]; every 3x3/1x1 interior
    conv runs s8xs8->s32.
    """

    def __init__(self, params, mode: str, q=None, pct: float = 100.0):
        self.p = params
        self.mode = mode
        self.q = q
        self.pct = pct
        self.taps = {}

    def _tap(self, name, x):
        # max-combine repeated taps: activations sharing one scale name
        # (C2f split halves, residual outputs, concat operands) calibrate
        # to the max of their ranges
        v = jnp.percentile(jnp.abs(x.astype(jnp.float32)).reshape(-1),
                           self.pct)
        prev = self.taps.get(name)
        self.taps[name] = v if prev is None else jnp.maximum(prev, v)

    def _scale(self, name):
        return self.q["act_scales"][name]

    def cbs(self, name, x, out_name, stride=1, residual=None):
        """ConvBNSiLU: conv -> SiLU epilogue -> (optional residual add) ->
        requantize/tap.  ``x`` is bf16 (calib) or int8 (int8 mode)."""
        if self.mode == "calib":
            node = _subtree(self.p, name)
            k = jnp.asarray(node["kernel"], jnp.bfloat16)
            b = jnp.asarray(node["bias"], jnp.bfloat16)
            y = jax.nn.silu(_conv_s(x, k, jnp.bfloat16, stride) + b)
            if residual is not None:
                y = y + residual[0]
            self._tap(out_name, y)
            return y
        layer = self.q[name]
        acc = _conv_s(x[0], layer["w8"], jnp.int32, stride)
        y = acc.astype(jnp.float32) * (self._scale(x[1]) * layer["sw"]) \
            + layer["b"]
        y = jax.nn.silu(y)
        if residual is not None:
            r8, rname = residual
            y = y + r8.astype(jnp.float32) * self._scale(rname)
        return (_q(y, self._scale(out_name)), out_name)

    def head_conv(self, name, x):
        """Final 1x1 head conv -> f32 logits."""
        if self.mode == "calib":
            node = _subtree(self.p, name)
            return _conv_s(x, jnp.asarray(node["kernel"], jnp.bfloat16),
                           jnp.bfloat16, 1) \
                + jnp.asarray(node["bias"], jnp.bfloat16)
        layer = self.q[name]
        acc = _conv_s(x[0], layer["w8"], jnp.int32, 1)
        return acc.astype(jnp.float32) * (self._scale(x[1]) * layer["sw"]) \
            + layer["b"]

    def concat(self, xs, out_name):
        """Concatenate same-scale activations (calibration pins the group);
        out_name names the shared scale of the result."""
        if self.mode == "calib":
            return jnp.concatenate(xs, axis=-1)
        return (jnp.concatenate([x[0] for x in xs], axis=-1), out_name)

    def split2(self, x, c):
        if self.mode == "calib":
            return x[..., :c], x[..., c:]
        return (x[0][..., :c], x[1]), (x[0][..., c:], x[1])

    def maxpool(self, x, k, stride, pad):
        if self.mode == "calib":
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
                ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        return (jax.lax.reduce_window(
            x[0], jnp.int8(-128), jax.lax.max, (1, k, k, 1),
            (1, stride, stride, 1),
            ((0, 0), (pad, pad), (pad, pad), (0, 0))), x[1])

    def upsample(self, x):
        if self.mode == "calib":
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return (jnp.repeat(jnp.repeat(x[0], 2, axis=1), 2, axis=2), x[1])

    def c2f(self, name, x, n: int, shortcut: bool):
        cv2 = f"{name}/ConvBNSiLU_1/Conv_0"
        c_out = (_subtree(self.p, cv2)["kernel"] if self.mode == "calib"
                 else self.q[cv2]["w8"]).shape[-1]
        c = c_out // 2
        y = self.cbs(f"{name}/ConvBNSiLU_0/Conv_0", x, f"{name}_cv1")
        p0, p1 = self.split2(y, c)
        parts = [p0, p1]
        for j in range(n):
            b = parts[-1]
            mid = self.cbs(f"{name}/Bottleneck_{j}/ConvBNSiLU_0/Conv_0", b,
                           f"{name}_b{j}m")
            res = b if shortcut else None
            # every part shares the cv1 scale so the concat stays one
            # fused int8 conv (calibration max-combines the taps)
            parts.append(self.cbs(
                f"{name}/Bottleneck_{j}/ConvBNSiLU_1/Conv_0", mid,
                f"{name}_cv1", residual=res))
        cat = self.concat(parts, f"{name}_cv1")
        return self.cbs(f"{name}/ConvBNSiLU_1/Conv_0", cat, f"{name}_out")

    def sppf(self, name, x):
        y = self.cbs(f"{name}/ConvBNSiLU_0/Conv_0", x, f"{name}_cv1")
        pools = [y]
        for _ in range(3):
            pools.append(self.maxpool(pools[-1], 5, 1, 2))
        cat = self.concat(pools, f"{name}_cv1")
        return self.cbs(f"{name}/ConvBNSiLU_1/Conv_0", cat, "sppf_out")

    def forward(self, x_raw, depth=(1, 2, 2, 1)):
        """Mirror of models/yolo.YOLOv8.__call__ (fuse_bn wiring).

        x_raw: raw 0..255 float frames (N, H, W, cin) — the /255 fold lives
        in the bf16 stem kernel, as in the production bf16 path.
        """
        d = depth
        stem = (_subtree(self.p, "ConvBNSiLU_0/Conv_0")
                if self.mode == "calib" else self.q["stem_bf16"])
        y = jax.nn.silu(_conv_s(
            x_raw.astype(jnp.bfloat16),
            jnp.asarray(stem["kernel"], jnp.bfloat16)
            * jnp.bfloat16(1.0 / 255.0), jnp.bfloat16, 2)
            + jnp.asarray(stem["bias"], jnp.bfloat16))          # P1/2
        if self.mode == "calib":
            self._tap("p1", y)
            x = y
        else:
            x = (_q(y.astype(jnp.float32), self._scale("p1")), "p1")

        x = self.cbs("ConvBNSiLU_1/Conv_0", x, "cbs1", stride=2)   # P2/4
        x = self.c2f("C2f_0", x, d[0], True)
        x = self.cbs("ConvBNSiLU_2/Conv_0", x, "cbs2", stride=2)   # P3/8
        x4 = self.c2f("C2f_1", x, d[1], True)
        x = self.cbs("ConvBNSiLU_3/Conv_0", x4, "cbs3", stride=2)  # P4/16
        x6 = self.c2f("C2f_2", x, d[2], True)
        x = self.cbs("ConvBNSiLU_4/Conv_0", x6, "cbs4", stride=2)  # P5/32
        x = self.c2f("C2f_3", x, d[3], True)
        x9 = self.sppf("SPPF_0", x)

        x = self.concat([self.upsample(x9), x6], "sppf_out")
        x12 = self.c2f("C2f_4", x, d[3], False)
        x = self.concat([self.upsample(x12), x4], "C2f_4_out")
        p3 = self.c2f("C2f_5", x, d[3], False)
        x = self.cbs("ConvBNSiLU_5/Conv_0", p3, "cbs5", stride=2)
        x = self.concat([x, x12], "C2f_4_out")
        p4 = self.c2f("C2f_6", x, d[3], False)
        x = self.cbs("ConvBNSiLU_6/Conv_0", p4, "cbs6", stride=2)
        x = self.concat([x, x9], "sppf_out")
        p5 = self.c2f("C2f_7", x, d[3], False)

        outs = []
        for i, f in enumerate((p3, p4, p5)):
            b = self.cbs(f"DetectHead_0/box{i}_0/Conv_0", f, f"box{i}a")
            b = self.cbs(f"DetectHead_0/box{i}_1/Conv_0", b, f"box{i}b")
            b = self.head_conv(f"DetectHead_0/box{i}_2", b)
            c = self.cbs(f"DetectHead_0/cls{i}_0/Conv_0", f, f"cls{i}a")
            c = self.cbs(f"DetectHead_0/cls{i}_1/Conv_0", c, f"cls{i}b")
            c = self.head_conv(f"DetectHead_0/cls{i}_2", c)
            outs.append((b.astype(jnp.float32), c.astype(jnp.float32)))
        return outs


def _subtree(params, path: str):
    node = params
    for part in path.split("/"):
        node = node[part]
    return node


def _conv_s(x, k, out_dtype, stride: int):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = k.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad)] * 2, dimension_numbers=dn,
        preferred_element_type=out_dtype)


def _yolo_taps(variables, x_raw, pct: float = 100.0):
    w = _YoloWalk(variables["params"], "calib", pct=pct)
    w.forward(x_raw)
    return w.taps


def quantize_yolo(variables: dict, calib_x_raw, pct: float = 100.0):
    """Post-training int8 quantization of FOLDED YOLOv8n variables.

    calib_x_raw: (N, H, W, cin) raw 0..255 float frames matching the stem's
    input-channel count (1 for gray-folded stems).  Returns qparams for
    :func:`qyolo_outputs`.
    """
    from openglottal_tpu.models.fold import is_folded

    if not is_folded(variables):
        raise ValueError("quantize_yolo expects fold_yolo-folded variables")
    params = variables["params"]

    acts = jax.jit(_yolo_taps, static_argnames=("pct",))(
        variables, jnp.asarray(calib_x_raw, jnp.float32), pct=pct)
    scales = {k: max(float(v) / 127.0, 1e-12) for k, v in acts.items()}
    # pin the FPN concat groups to one shared scale (C2f-internal groups
    # are pinned by construction: their taps share one name, max-combined)
    for group in (("sppf_out", "C2f_2_out", "cbs6"),
                  ("C2f_4_out", "C2f_1_out", "cbs5")):
        sc = max(scales[n] for n in group)
        for n in group:
            scales[n] = sc

    q: dict[str, Any] = {"act_scales": scales}
    stem = _subtree(params, "ConvBNSiLU_0/Conv_0")
    q["stem_bf16"] = {"kernel": jnp.asarray(stem["kernel"], jnp.bfloat16),
                      "bias": jnp.asarray(stem["bias"], jnp.bfloat16)}

    def add_conv(path):
        node = _subtree(params, path)
        w8, sw = quantize_weights(node["kernel"])
        q[path] = {"w8": jnp.asarray(w8), "sw": jnp.asarray(sw),
                   "b": jnp.asarray(node["bias"], jnp.float32)}

    def walk(node, path=""):
        for k, v in node.items():
            sub = f"{path}/{k}" if path else k
            if isinstance(v, dict) and "kernel" in v:
                if sub != "ConvBNSiLU_0/Conv_0":  # bf16 stem
                    add_conv(sub)
            elif isinstance(v, dict):
                walk(v, sub)

    walk(params)
    return q


def qyolo_forward(qparams, x_raw):
    """int8 YOLOv8n forward -> per-level (box, cls) f32 logits, matching
    ``YOLOv8(fuse_bn=True).apply`` on raw 0..255 input (the /255 fold lives
    in the bf16 stem kernel).  Plain traceable function; jitted form below."""
    return _YoloWalk(None, "int8", q=qparams).forward(x_raw)


@jax.jit
def qyolo_outputs(qparams, x_raw):
    """Jitted :func:`qyolo_forward`."""
    return qyolo_forward(qparams, x_raw)


# ── qparams persistence ──────────────────────────────────────────────────────
# Serving numerics must not depend on request arrival order: lazy first-video
# calibration is convenient for ad-hoc runs, but production serving persists
# the calibration with the checkpoint and restores it exactly (VERDICT r3
# item 6).  One .npz, '/'-joined tree paths; bfloat16 leaves round-trip
# through float32 with a '::bf16' key marker (np.savez stores raw bf16 as
# opaque void bytes and loses the dtype); the float act_scales restore as
# python floats so a restored qparams tree is indistinguishable from a
# freshly calibrated one (pinned by tests/test_quant.py roundtrip).


def save_qparams(qparams: dict, path) -> None:
    """Persist a qparams tree ({'unet': ..., optional 'yolo': ...} or a bare
    single-model tree) produced by :func:`quantize_unet` /
    :func:`quantize_yolo` to one ``.npz``."""
    from pathlib import Path

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            a = np.asarray(node)
            if a.dtype == jnp.bfloat16:
                flat[f"{prefix}::bf16"] = a.astype(np.float32)
            else:
                flat[prefix] = a

    walk("", qparams)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_qparams(path) -> dict:
    """Inverse of :func:`save_qparams`."""
    tree: dict = {}
    with np.load(path) as z:
        for key in z.files:
            k, bf16 = (key[:-6], True) if key.endswith("::bf16") else (key, False)
            node = tree
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            v = z[key]
            if bf16:
                v = jnp.asarray(v, jnp.bfloat16)
            elif "act_scales" in parts:
                v = float(v)  # calibrated scales are python floats
            node[parts[-1]] = v
    return tree
