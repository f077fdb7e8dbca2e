"""Lightweight 4-level U-Net for binary glottal segmentation (Flax, NHWC).

Same architecture family as the reference (openglottal/models/unet.py:18-88):
encoder widths (32, 64, 128, 256), DoubleConv = 2 x (Conv3x3 -> BN -> ReLU),
2x2 max-pool, ConvTranspose(k=2, s=2) upsampling with skip concatenation
(skip first, matching torch.cat([s, x], dim=1) at unet.py:86), 1x1 logits
head.  7.76M parameters (paper/main.tex:368-369).

TPU-first differences: NHWC layout, fp32 params with configurable compute
dtype (bfloat16 on TPU), and the forward pass is designed to run on *chunks*
of video frames (N = frame-chunk axis) rather than per frame.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class _SplitConv3x3(nn.Module):
    """Conv3x3 over the concatenation of two inputs WITHOUT materialising it:

        conv(concat([s, x]), k) == conv(s, k[:, :, :cs]) + conv(x, k[:, :, cs:])

    (convolution is linear in the input channels).  The parameter tree —
    ``kernel`` (3, 3, cs+cx, out) and optional ``bias`` — is identical in
    name, shape, and init to ``nn.Conv`` applied to the concat, so variables
    are interchangeable; only the lowering changes.  Isolated, the split wins
    on TPU v5e (7.9 -> 5.6 ms per 128-frame chunk on the 256² 64->32 decoder
    conv, scripts/perf_probe.py stages); at full-model level XLA already schedules
    the concat well and the split measured ~5 ms/video slower
    (scripts/perf_probe.py followup), so it is NOT the default.
    Numerics differ from the
    concat form only at the single reassociation boundary between the two
    partial sums (~1 ulp; pinned by tests/test_unet.py)."""

    out_ch: int
    dtype: Any = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, s, x):
        cs, cx = s.shape[-1], x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cs + cx, self.out_ch), jnp.float32)
        k = kernel.astype(self.dtype)
        s = s.astype(self.dtype)
        x = x.astype(self.dtype)

        def conv(inp, kk):
            dn = jax.lax.conv_dimension_numbers(
                inp.shape, kk.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                inp, kk, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)

        y = conv(s, k[:, :, :cs]) + conv(x, k[:, :, cs:])
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.out_ch,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class DoubleConv(nn.Module):
    """Two Conv3x3(no bias) -> BatchNorm -> ReLU blocks (reference unet.py:18-33).

    ``fuse_bn=True`` runs the inference-folded form Conv3x3(+bias) -> ReLU
    (BatchNorm scale/shift pre-multiplied into the conv weights by
    models/fold.fold_batchnorm) — same math up to float reassociation, one
    fewer HBM round-trip per conv on TPU.  Conv param names are unchanged,
    so folded variables drop straight in.

    ``skip``: decoder blocks may pass the skip connection separately instead
    of concatenating — the first conv then runs as :class:`_SplitConv3x3`
    (same parameters, no concat materialisation)."""

    out_ch: int
    dtype: Any = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, skip=None):
        for i in range(2):
            if i == 0 and skip is not None:
                x = _SplitConv3x3(self.out_ch, self.dtype, self.fuse_bn,
                                  name="Conv_0")(skip, x)
            else:
                x = nn.Conv(
                    self.out_ch, (3, 3), padding=1, use_bias=self.fuse_bn,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"Conv_{i}",
                )(x)
            if not self.fuse_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=jnp.float32, name=f"BatchNorm_{i}",
                )(x)
            x = nn.relu(x)
        return x


class DepthToSpaceUp(nn.Module):
    """``nn.ConvTranspose((2, 2), strides=(2, 2))`` lowered as one dense
    matmul + depth-to-space.

    A 2x2-stride-2 transposed conv has non-overlapping taps, so each output
    pixel is a single dot product over the input channels:

        out[2i+di, 2j+dj, o] = x[i, j, :] @ kernel[1-di, 1-dj, :, o] + bias[o]

    (kernel orientation verified numerically against flax's lowering).  The
    parameters — ``kernel`` (2, 2, cin, cout) and ``bias`` (cout,) — are
    bit-identical in name, shape, and init to ``nn.ConvTranspose``, so
    trained/folded variables drop in either way; only the lowering changes
    (one (cin, 4*cout) matmul + depth-to-space).  Measured SLOWER than XLA's
    ConvTranspose lowering at full-model level on TPU v5e (perf_probe.py stages —
    the d2s transpose costs an extra full-tensor HBM round-trip), so it is
    NOT the default; kept because the interchangeable-parameters property is
    useful and pinned (tests/test_unet.py).
    """

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, cin, self.out_ch), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.out_ch,), jnp.float32)
        k = kernel[::-1, ::-1].reshape(4, cin, self.out_ch)
        k = k.transpose(1, 0, 2).reshape(cin, 4 * self.out_ch)
        x = x.astype(self.dtype)
        y = x @ k.astype(self.dtype) + jnp.tile(bias, 4).astype(self.dtype)
        n, h, w, _ = y.shape
        y = y.reshape(n, h, w, 2, 2, self.out_ch)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, 2 * h, 2 * w, self.out_ch)


class UNet(nn.Module):
    """U-Net over NHWC frames; returns raw logits (reference unet.py:36-88)."""

    out_ch: int = 1
    features: Sequence[int] = (32, 64, 128, 256)
    dtype: Any = jnp.float32
    fuse_bn: bool = False  # inference-folded BN (models/fold.py)
    # matmul+depth-to-space upsampling (same params/math as nn.ConvTranspose,
    # see DepthToSpaceUp).  Default OFF: measured SLOWER on TPU v5e — the
    # whole-video U-Net pass is 130 ms with XLA's ConvTranspose lowering vs
    # 153 ms with d2s (scripts/perf_probe.py stages) because the depth-to-space
    # transpose materialises an extra full-tensor HBM round-trip that the
    # fused transposed-conv epilogue avoids.  Kept as an option because the
    # parameter trees are interchangeable (tests/test_unet.py).
    d2s_up: bool = False
    # decoder skip connections consumed WITHOUT materialising the concat
    # (_SplitConv3x3 — same parameters).  Default OFF: the isolated-layer
    # microbench wins (7.9 -> 5.6 ms, perf_probe.py stages) but at FULL-model level
    # XLA already schedules the concat well and the split form measured
    # ~5 ms/512-frame-video slower (130.0 -> 136.0 ms,
    # scripts/perf_probe.py followup).
    # Kept as an interchangeable-parameters option (tests/test_unet.py).
    split_skip: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        skips = []
        for f in self.features:
            x = DoubleConv(f, self.dtype, self.fuse_bn)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = DoubleConv(self.features[-1] * 2, self.dtype, self.fuse_bn)(x, train)

        for i, f in enumerate(reversed(self.features)):
            if self.d2s_up:
                x = DepthToSpaceUp(f, self.dtype,
                                   name=f"ConvTranspose_{i}")(x)
            else:
                x = nn.ConvTranspose(
                    f, (2, 2), strides=(2, 2),
                    dtype=self.dtype, param_dtype=jnp.float32,
                )(x)
            s = skips.pop()
            if x.shape[1:3] != s.shape[1:3]:  # bilinear size fix (unet.py:84-85)
                x = jax.image.resize(
                    x, (x.shape[0], s.shape[1], s.shape[2], x.shape[3]), "bilinear"
                )
            if self.split_skip:
                # skip-first channel order preserved (torch.cat([s, x], dim=1))
                x = DoubleConv(f, self.dtype, self.fuse_bn)(
                    x.astype(s.dtype), train, skip=s)
            else:
                x = jnp.concatenate([s, x.astype(s.dtype)], axis=-1)
                x = DoubleConv(f, self.dtype, self.fuse_bn)(x, train)

        return nn.Conv(self.out_ch, (1, 1), param_dtype=jnp.float32,
                       dtype=self.dtype)(x).astype(jnp.float32)


def init_unet(rng, features=(32, 64, 128, 256), dtype=jnp.float32, size: int = 256):
    """Initialise a U-Net; returns (model, variables)."""
    model = UNet(features=tuple(features), dtype=dtype)
    variables = model.init(rng, jnp.zeros((1, size, size, 1), jnp.float32), train=False)
    return model, variables


# ── split forward: everything through the 128²-level decoder block, then a
# full-frame OR box-windowed 256²-level tail ─────────────────────────────────
#
# Pipeline 3 (yolo+unet, reference features.py:237-245) only CONSUMES mask
# pixels inside the per-frame gate box, yet ~24 ms of the 107.75 ms/video
# device time (results/PROFILE_r03.md) is the full-frame 256²-level decoder
# (ConvTranspose_3 + DoubleConv_8 + head) running at the HBM bandwidth floor.
# Splitting the forward lets the fused pipeline run that tail on a (win, win)
# window anchored to each frame's gate box — the same windowing structure the
# guided-VFT tracker tail uses (ops/blobs.top_n_blobs_batch_roi) — computing
# logits EXACTLY (halo'd valid convs reproduce the full-frame 'same' conv at
# every window pixel) so the in-box area sum is unchanged.


def _subvars(variables: dict, name: str) -> dict:
    """Variables for the standalone submodule ``name`` of a UNet tree."""
    out = {"params": variables["params"][name]}
    bs = variables.get("batch_stats")
    if bs and name in bs:
        out["batch_stats"] = bs[name]
    return out


def unet_features(variables) -> tuple:
    """Encoder widths recovered from the parameter tree."""
    p = variables["params"]
    feats = []
    for i in range(len(p)):
        name = f"DoubleConv_{i}"
        if name not in p:
            break
        feats.append(p[name]["Conv_0"]["kernel"].shape[-1])
    n_enc = (len(feats) - 1) // 2  # encoder blocks (bottleneck + decoder follow)
    return tuple(feats[:n_enc])


def unet_apply_to_mid(variables, x, dtype=jnp.float32, fuse_bn: bool = False):
    """UNet.__call__ up to (and including) the second-to-last decoder block.

    Returns ``(y_mid, skip1)``: ``y_mid`` is the DoubleConv_7 output at half
    resolution (N, H/2, W/2, 2f0) and ``skip1`` the first encoder block's
    output (N, H, W, f0).  Composing with :func:`unet_tail_full` is
    bit-identical to ``UNet.apply`` — the same Flax submodules run in the
    same order with the same dtype flow (pinned by tests/test_unet_window.py).
    """
    feats = unet_features(variables)
    x = x.astype(dtype)
    skips = []
    for i, f in enumerate(feats):
        x = DoubleConv(f, dtype, fuse_bn).apply(
            _subvars(variables, f"DoubleConv_{i}"), x, False)
        skips.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
    n = len(feats)
    x = DoubleConv(feats[-1] * 2, dtype, fuse_bn).apply(
        _subvars(variables, f"DoubleConv_{n}"), x, False)
    for i, f in enumerate(reversed(feats[1:])):  # stop before the last level
        x = nn.ConvTranspose(
            f, (2, 2), strides=(2, 2), dtype=dtype, param_dtype=jnp.float32,
        ).apply(_subvars(variables, f"ConvTranspose_{i}"), x)
        s = skips.pop()
        x = jnp.concatenate([s, x.astype(s.dtype)], axis=-1)
        x = DoubleConv(f, dtype, fuse_bn).apply(
            _subvars(variables, f"DoubleConv_{n + 1 + i}"), x, False)
    return x, skips[0]


def unet_tail_full(variables, y_mid, skip1, dtype=jnp.float32,
                   fuse_bn: bool = False):
    """The remaining full-frame 256²-level tail: ConvTranspose_3 upsample,
    skip-first concat, DoubleConv_8, 1x1 head.  (unet_apply_to_mid ∘ this)
    == UNet.apply bit-for-bit."""
    feats = unet_features(variables)
    f0, n = feats[0], len(feats)
    x = nn.ConvTranspose(
        f0, (2, 2), strides=(2, 2), dtype=dtype, param_dtype=jnp.float32,
    ).apply(_subvars(variables, f"ConvTranspose_{n - 1}"), y_mid)
    x = jnp.concatenate([skip1, x.astype(skip1.dtype)], axis=-1)
    x = DoubleConv(f0, dtype, fuse_bn).apply(
        _subvars(variables, f"DoubleConv_{2 * n}"), x, False)
    return nn.Conv(1, (1, 1), dtype=dtype, param_dtype=jnp.float32).apply(
        _subvars(variables, "Conv_0"), x).astype(jnp.float32)


def window_origins(boxes, valid, h: int, w: int, win: int):
    """Even-aligned per-frame (win, win) window origins covering each valid
    frame's box.  Returns (fits, oy, ox).

    Same containment scheme as ops/blobs.roi_window_origin (origin clamps
    [x1+1-win, x1+1) in-frame) with two differences: origins round DOWN to
    even so the window is exactly representable at the half-resolution
    feature grid (ConvTranspose stride 2), and invalid frames are excluded
    from the ``fits`` test (their area is 0 whatever the window sees).
    Rounding down keeps covering the box: x1 <= ox+win-1 still holds after
    ox drops by 1, and clamps stay in-frame because w-win is even."""
    boxes = boxes.astype(jnp.int32)
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ok = ((x1 - x0) <= win - 2) & ((y1 - y0) <= win - 2)
    fits = jnp.all(ok | ~valid)
    ox = jnp.clip(x1 + 1 - win, 0, w - win) & ~1
    oy = jnp.clip(y1 + 1 - win, 0, h - win) & ~1
    return fits, oy, ox


def _conv_valid(x, kernel, bias, dtype):
    """Conv with VALID padding, same dtype flow as ``nn.Conv`` (inputs and
    kernel cast to ``dtype``, f32 params)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), "VALID",
        dimension_numbers=dn)
    return y + bias.astype(dtype)


def unet_tail_window(variables, y_mid, skip1, oy, ox, dtype=jnp.float32,
                     win: int = 128):
    """The 256²-level tail evaluated ONLY on per-frame (win, win) windows at
    even origins (oy, ox) — logits bit-equal to the full-frame tail's values
    at those pixels (folded-BN variables required: the windowed convs run
    as conv+bias+ReLU).

    Exactness: DoubleConv_8's two 'same' 3x3 convs need a 2-px halo, so the
    window computes on (win+4)² inputs sliced from zero-padded full-frame
    tensors — out-of-frame positions read 0, which is precisely the zero
    padding the full-frame conv applies at frame borders (interior windows
    have real values in the halo).  The upsample contributes (win+4)² from
    (win/2+2)² of ``y_mid`` (a stride-2 k=2 transposed conv maps input i to
    outputs 2i/2i+1 only — no halo of its own), with positions outside the
    frame zeroed explicitly (the full-frame up tensor does not exist there;
    the 'same' conv would read 0).

    Returns (N, win, win, 1) f32 logits for windows at (oy, ox).
    """
    p = variables["params"]
    feats = unet_features(variables)
    f0, n = feats[0], len(feats)
    halo = 2
    wh = win + 2 * halo

    # upsample each frame's (win/2 + halo)² y_mid window -> (wh)²
    kt = p[f"ConvTranspose_{n - 1}"]["kernel"]
    bt = p[f"ConvTranspose_{n - 1}"]["bias"]
    mh = win // 2 + halo
    y_pad = jnp.pad(y_mid, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def one_mid(ym, y, x):
        return jax.lax.dynamic_slice(
            ym, (y // 2, x // 2, 0), (mh, mh, ym.shape[-1]))

    ymw = jax.vmap(one_mid)(y_pad, oy, ox)  # (N, mh, mh, 2f0)
    up = nn.ConvTranspose(
        f0, (2, 2), strides=(2, 2), dtype=dtype, param_dtype=jnp.float32,
    ).apply({"params": {"kernel": kt, "bias": bt}}, ymw)  # (N, wh, wh, f0)

    # zero positions outside the frame (the full-frame up tensor ends at the
    # frame border; 'same' convs read 0 beyond it)
    hh, ww = skip1.shape[1:3]
    rows = oy[:, None] - halo + jnp.arange(wh)[None]      # (N, wh)
    cols = ox[:, None] - halo + jnp.arange(wh)[None]
    rin = (rows >= 0) & (rows < hh)
    cin_ = (cols >= 0) & (cols < ww)
    up = up * (rin[:, :, None] & cin_[:, None, :])[..., None].astype(up.dtype)

    # skip window from the zero-padded full-frame tensor
    s_pad = jnp.pad(skip1, ((0, 0), (halo, halo), (halo, halo), (0, 0)))

    def one_skip(sp, y, x):
        return jax.lax.dynamic_slice(sp, (y, x, 0), (wh, wh, sp.shape[-1]))

    sw = jax.vmap(one_skip)(s_pad, oy, ox)                # (N, wh, wh, f0)

    x = jnp.concatenate([sw, up.astype(sw.dtype)], axis=-1)
    d8 = p[f"DoubleConv_{2 * n}"]
    x = nn.relu(_conv_valid(x, d8["Conv_0"]["kernel"], d8["Conv_0"]["bias"],
                            dtype))                       # (N, win+2, win+2)
    # the full-frame second conv reads the FIRST conv's output through its
    # own 1-px zero padding at frame borders — emulate it by zeroing the
    # intermediate at out-of-frame positions (bias+ReLU make them nonzero in
    # the valid-conv chain; interior windows are unaffected)
    x = x * (rin[:, 1:-1, None] & cin_[:, None, 1:-1])[..., None].astype(
        x.dtype)
    x = nn.relu(_conv_valid(x, d8["Conv_1"]["kernel"], d8["Conv_1"]["bias"],
                            dtype))                       # (N, win, win)
    head = p["Conv_0"]
    y = _conv_valid(x, head["kernel"], head["bias"], dtype)
    return y.astype(jnp.float32)


def unet_apply_to_d3(variables, x, dtype=jnp.float32, fuse_bn: bool = False):
    """UNet.__call__ up to (and including) the 64²-level decoder block
    (DoubleConv_6).  Returns (d3out, skip2, skip1): the 64²-level decoder
    output (N, H/4, W/4, 4f0) plus the two shallow encoder skips.
    unet_mid_full ∘ unet_tail_full composes back to UNet.apply bit-for-bit
    (pinned by tests/test_unet_window.py)."""
    feats = unet_features(variables)
    x = x.astype(dtype)
    skips = []
    for i, f in enumerate(feats):
        x = DoubleConv(f, dtype, fuse_bn).apply(
            _subvars(variables, f"DoubleConv_{i}"), x, False)
        skips.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
    n = len(feats)
    x = DoubleConv(feats[-1] * 2, dtype, fuse_bn).apply(
        _subvars(variables, f"DoubleConv_{n}"), x, False)
    for i, f in enumerate(reversed(feats[2:])):  # stop before the 128² level
        x = nn.ConvTranspose(
            f, (2, 2), strides=(2, 2), dtype=dtype, param_dtype=jnp.float32,
        ).apply(_subvars(variables, f"ConvTranspose_{i}"), x)
        s = skips.pop()
        x = jnp.concatenate([s, x.astype(s.dtype)], axis=-1)
        x = DoubleConv(f, dtype, fuse_bn).apply(
            _subvars(variables, f"DoubleConv_{n + 1 + i}"), x, False)
    return x, skips[1], skips[0]


def unet_mid_full(variables, d3out, skip2, dtype=jnp.float32,
                  fuse_bn: bool = False):
    """The full-frame 128²-level decoder block: ConvTranspose_2 upsample,
    skip-first concat, DoubleConv_7.  (unet_apply_to_d3 ∘ this) ==
    unet_apply_to_mid bit-for-bit."""
    feats = unet_features(variables)
    f1, n = feats[1], len(feats)
    x = nn.ConvTranspose(
        f1, (2, 2), strides=(2, 2), dtype=dtype, param_dtype=jnp.float32,
    ).apply(_subvars(variables, f"ConvTranspose_{n - 2}"), d3out)
    x = jnp.concatenate([skip2, x.astype(skip2.dtype)], axis=-1)
    return DoubleConv(f1, dtype, fuse_bn).apply(
        _subvars(variables, f"DoubleConv_{2 * n - 1}"), x, False)


def unet_mid_window(variables, d3out, skip2, oy, ox, dtype=jnp.float32,
                    win: int = 160):
    """The 128²-level decoder block evaluated only on the window the
    256²-level tail needs: given a frame-level origin (oy, ox) with
    oy ≡ 2 (mod 4) and 6 <= o, o + win <= H - 6, returns DoubleConv_7's
    output on rows [oy/2 - 1, oy/2 - 1 + win/2 + 2) — exactly the
    (win/2+2)² block :func:`unet_tail_window_chunk` would slice from the
    full y_mid.  Halos are real in-frame data (interior margins), so the
    valid convs reproduce the full-frame values exactly (f32-pinned)."""
    p = variables["params"]
    feats = unet_features(variables)
    f1, n = feats[1], len(feats)
    mw = win // 2 + 6          # concat-level window (halo 3 per side at 128²)
    m0y, m0x = oy // 2 - 3, ox // 2 - 3   # even by the origin lattice

    d3w = jax.lax.dynamic_slice(
        d3out, (0, m0y // 2, m0x // 2, 0),
        (d3out.shape[0], mw // 2, mw // 2, d3out.shape[-1]))
    up = nn.ConvTranspose(
        f1, (2, 2), strides=(2, 2), dtype=dtype, param_dtype=jnp.float32,
    ).apply({"params": p[f"ConvTranspose_{n - 2}"]}, d3w)   # (N, mw, mw, f1)
    s2 = jax.lax.dynamic_slice(
        skip2, (0, m0y, m0x, 0), (skip2.shape[0], mw, mw, skip2.shape[-1]))

    x = jnp.concatenate([s2, up.astype(s2.dtype)], axis=-1)
    d7 = p[f"DoubleConv_{2 * n - 1}"]
    x = nn.relu(_conv_valid(x, d7["Conv_0"]["kernel"], d7["Conv_0"]["bias"],
                            dtype))                         # mw-2
    x = nn.relu(_conv_valid(x, d7["Conv_1"]["kernel"], d7["Conv_1"]["bias"],
                            dtype))                         # mw-4 = win/2+2
    return x


def _tail_from_ymw(variables, ymw, skip1, oy, ox, dtype, win):
    """256²-level tail given the (win/2+2)² y_mid window at
    [oy/2-1, ox/2-1] (see unet_tail_window_chunk for the derivation)."""
    p = variables["params"]
    feats = unet_features(variables)
    f0, n = feats[0], len(feats)
    halo = 2
    wh = win + 2 * halo

    up = nn.ConvTranspose(
        f0, (2, 2), strides=(2, 2), dtype=dtype, param_dtype=jnp.float32,
    ).apply({"params": p[f"ConvTranspose_{n - 1}"]}, ymw)   # (N, wh, wh, f0)
    sw = jax.lax.dynamic_slice(
        skip1, (0, oy - halo, ox - halo, 0),
        (skip1.shape[0], wh, wh, skip1.shape[-1]))

    x = jnp.concatenate([sw, up.astype(sw.dtype)], axis=-1)
    d8 = p[f"DoubleConv_{2 * n}"]
    x = nn.relu(_conv_valid(x, d8["Conv_0"]["kernel"], d8["Conv_0"]["bias"],
                            dtype))
    x = nn.relu(_conv_valid(x, d8["Conv_1"]["kernel"], d8["Conv_1"]["bias"],
                            dtype))
    head = p["Conv_0"]
    y = _conv_valid(x, head["kernel"], head["bias"], dtype)
    return y.astype(jnp.float32)


def unet_tail_window_chunk(variables, y_mid, skip1, oy, ox,
                           dtype=jnp.float32, win: int = 160):
    """The 256²-level tail on ONE (win, win) window shared by every frame of
    a chunk, at scalar even origin (oy, ox) with 2 <= o and o + win <= H-2.

    The per-frame form (:func:`unet_tail_window`) is exact everywhere but
    its halo pads + per-frame dynamic slices lowered to ~70 ms/video of pad
    and gather copies on TPU v5e (profiled — the round-2 "big gather" cliff
    class).  The gate box is quasi-static across one chunk's 128 consecutive
    frames (the folds vibrate in place), so the production graph uses one
    UNION window per chunk: the slices become two contiguous
    ``dynamic_slice`` ops XLA fuses into the consuming convs, and because
    the origin is interior (2-px margin in-frame), the halo reads REAL
    neighbours — no zero-pad emulation, no masking; the halo'd valid convs
    reproduce the full-frame 'same'-conv values exactly (pinned in f32 by
    tests/test_unet_window.py).

    Returns (N, win, win, 1) f32 logits for the window [oy, oy+win) x
    [ox, ox+win).
    """
    halo = 2
    mh = (win + 2 * halo) // 2
    ymw = jax.lax.dynamic_slice(
        y_mid, (0, (oy - halo) // 2, (ox - halo) // 2, 0),
        (y_mid.shape[0], mh, mh, y_mid.shape[-1]))
    return _tail_from_ymw(variables, ymw, skip1, oy, ox, dtype, win)


def chunk_window_origin(boxes, valid, h: int, w: int, win: int,
                        lattice: int = 2, margin: int = 2):
    """One (win, win) window per CHUNK covering the union of its valid
    boxes, interior by ``margin`` px (so the windowed tails need no
    zero-halo emulation), origin on the ``lattice`` grid offset so the
    half- and quarter-resolution feature slices stay aligned (lattice 2:
    o even — unet_tail_window_chunk; lattice 4: o ≡ 2 mod 4 with margin 6 —
    unet_mid_window's quarter-res slice start (o/2-3)/2 must be integral).
    Returns (fits, oy, ox); ``fits`` is the DIRECT containment test, so
    callers fall back full-frame for chunks whose boxes move too much,
    touch the frame border, or exceed the window."""
    big = jnp.iinfo(jnp.int32).max
    b = boxes.astype(jnp.int32)
    v = valid[:, None]
    lo = jnp.min(jnp.where(v, b[:, :2], big), axis=0)     # (ux0, uy0)
    hi = jnp.max(jnp.where(v, b[:, 2:], -big), axis=0)    # (ux1, uy1)
    any_valid = jnp.any(valid)
    lo = jnp.where(any_valid, lo, margin)
    hi = jnp.where(any_valid, hi, margin + 2)
    off = 2 if lattice == 4 else 0   # lattice points: off, off+lattice, ...

    def snap(o, dim):
        o = jnp.clip(o, margin, dim - win - margin)
        o = ((o - off) // lattice) * lattice + off
        return jnp.maximum(o, margin)  # snap-down may undershoot the margin

    ox = snap((lo[0] + hi[0]) // 2 - win // 2, w)
    oy = snap((lo[1] + hi[1]) // 2 - win // 2, h)
    fits = ((ox <= lo[0]) & (hi[0] <= ox + win)
            & (oy <= lo[1]) & (hi[1] <= oy + win)
            & (ox + win + margin <= w) & (oy + win + margin <= h))
    return fits, oy, ox


def segment_frames(variables, frames_gray_u8, model: UNet | None = None,
                   threshold: float = 0.5, chunk_dtype=jnp.float32):
    """Batched equivalent of the reference's per-frame ``unet_segment_frame``
    (openglottal/utils.py:218-241).

    frames_gray_u8: (N, H, W) uint8 grayscale.  Each frame is bilinearly
    resized to 256x256 (cv2 semantics), normalised to [0,1], segmented, and
    the probability map resized back; returns boolean masks (N, H, W).
    """
    from openglottal_tpu.ops.resize import resize_bilinear

    if model is None:
        model = UNet(dtype=chunk_dtype)
    n, h, w = frames_gray_u8.shape
    x = frames_gray_u8.astype(jnp.float32)
    if (h, w) != (256, 256):
        x = resize_bilinear(x, 256, 256)
    x = (x / 255.0)[..., None]
    logits = model.apply(variables, x, train=False)
    prob = jax.nn.sigmoid(logits[..., 0])
    if (h, w) != (256, 256):
        prob = resize_bilinear(prob, h, w)
    return prob > threshold
