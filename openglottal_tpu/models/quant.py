"""Post-training int8 quantization of the U-Net inference path.

Why: the round-3 device-trace attribution (results/PROFILE_r03.md) shows the
fused YOLO+UNet video graph is split between MXU-bound mid layers and
HBM-bandwidth-floor 256² layers.  int8 attacks both at once on TPU v5e: the
MXU runs s8xs8->s32 at 2x the bf16 rate (394 vs 197 TOPS peak) and int8
activations halve the bytes of every bandwidth-bound layer.  Measured on the
dominant 256² 32->32 shape: 1.85x over bf16 (scripts/perf_probe7.py, chained
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

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

FEATURES = (32, 64, 128, 256)


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
    from openglottal_tpu.models.unet import UNet

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
