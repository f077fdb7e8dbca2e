"""Inference BatchNorm folding: Conv(no bias) -> BN -> act  ==>  Conv(+bias) -> act.

With running statistics, BatchNorm is an affine map per channel:

    y = gamma * (x - mean) / sqrt(var + eps) + beta
      = scale * x + (beta - mean * scale),        scale = gamma / sqrt(var+eps)

so it folds exactly into the preceding convolution's weights and a bias —
the classic inference deployment transform (the reference inherits it from
torch/ultralytics' ``model.fuse()``; here it is the TPU lever that removes
one full HBM round-trip per conv: the conv epilogue becomes bias+activation,
with no separate f32 normalize pass between bf16 convs).

Folded variables drop into ``UNet(fuse_bn=True)`` / ``YOLOv8(fuse_bn=True)``
unchanged: conv param names are identical, BatchNorm params disappear, and
no ``batch_stats`` collection remains.  Numerics match the unfolded model up
to float reassociation (pinned by tests/test_fold.py).
"""

from __future__ import annotations

import jax.numpy as jnp

UNET_BN_EPS = 1e-5  # models/unet.py DoubleConv
YOLO_BN_EPS = 1e-3  # models/yolo.py ConvBNSiLU


def _fold_tree(params: dict, stats: dict, eps: float) -> dict:
    """Recursively fold every ``Conv_i`` with its sibling ``BatchNorm_i``.

    Flax numbers autonamed children per module, so inside DoubleConv /
    ConvBNSiLU the pairing is exactly index-matched; convs with no BN
    sibling (logit heads, ConvTranspose upsamplers) pass through untouched.
    """
    out = {}
    for k, v in params.items():
        if k.startswith("BatchNorm_"):
            continue  # consumed by the paired conv below
        if isinstance(v, dict) and "kernel" in v:
            bn_key = "BatchNorm_" + k.rsplit("_", 1)[-1]
            if k.startswith("Conv_") and bn_key in params:
                bn = params[bn_key]
                st = stats[bn_key]
                scale = bn["scale"] / jnp.sqrt(st["var"] + eps)
                folded = {"kernel": v["kernel"] * scale,  # HWIO: O is last
                          "bias": bn["bias"] - st["mean"] * scale}
                if "bias" in v:  # defensive; these convs are bias-free
                    folded["bias"] = folded["bias"] + v["bias"] * scale
                out[k] = folded
                continue
            out[k] = v
        elif isinstance(v, dict):
            out[k] = _fold_tree(v, stats.get(k, {}), eps)
        else:
            out[k] = v
    return out


def fold_batchnorm(variables: dict, eps: float) -> dict:
    """Fold a trained {'params', 'batch_stats'} tree for a fuse_bn=True model.

    Idempotent-safe: variables without ``batch_stats`` (already folded, or a
    BN-free model) are returned unchanged.
    """
    if "batch_stats" not in variables or not variables["batch_stats"]:
        return variables
    return {"params": _fold_tree(dict(variables["params"]),
                                 dict(variables["batch_stats"]), eps)}


def fold_unet(variables: dict) -> dict:
    """Folded variables for ``UNet(fuse_bn=True)``."""
    return fold_batchnorm(variables, UNET_BN_EPS)


def fold_yolo(variables: dict) -> dict:
    """Folded variables for ``YOLOv8(fuse_bn=True)``."""
    return fold_batchnorm(variables, YOLO_BN_EPS)


def fold_gray_stem(yolo_variables: dict) -> dict:
    """Sum the YOLO stem conv kernel over its RGB input axis -> a model that
    takes 1-channel (grayscale) input directly.

    High-speed endoscopy video is monochrome, so the pipelines replicate the
    gray channel to RGB on device (pipelines._yolo_chunk_gray).  Convolution
    is linear in the input channels, so for equal channels
    ``conv(bcast3(x), k) == conv(x, k.sum(axis=2))`` — folding the sum into
    the kernel skips reading 3x the stem input and the broadcast
    materialisation.  Numerics match the broadcast path up to one bf16
    rounding of the summed kernel (pinned by tests/test_fold.py).

    Idempotent: a stem already folded to 1 input channel passes through.
    """
    params = yolo_variables["params"]
    stem = params["ConvBNSiLU_0"]["Conv_0"]
    if stem["kernel"].shape[2] == 1:
        return yolo_variables
    out = dict(yolo_variables)
    out["params"] = dict(params)
    out["params"]["ConvBNSiLU_0"] = dict(params["ConvBNSiLU_0"])
    out["params"]["ConvBNSiLU_0"]["Conv_0"] = dict(stem)
    out["params"]["ConvBNSiLU_0"]["Conv_0"]["kernel"] = (
        stem["kernel"].sum(axis=2, keepdims=True))
    return out


UNET_STEM = ("DoubleConv_0", "Conv_0")
YOLO_STEM = ("ConvBNSiLU_0", "Conv_0")


def absorb_u8_scale(variables: dict, stem: tuple[str, ...]):
    """Fold the /255 input normalisation into the stem conv kernel.

    Convolution is linear in its input, so ``conv(x/255, k) == conv(x,
    k/255)`` — scaling the stem kernel lets the pipelines feed raw 0..255
    pixel values and skip the full-tensor normalisation pass between the
    uint8 decode and the first conv (one fewer elementwise HBM round-trip
    per model per chunk on TPU).  uint8 values are exact in bfloat16, so
    this trades a per-PIXEL rounding of x/255 for a per-WEIGHT rounding of
    k/255 — same math, one reassociation (pinned by tests/test_fold.py).

    Called inside jitted graphs: the scale is a (3, 3, cin, cout) multiply,
    negligible next to the convs.  Only the kernel is scaled — a folded
    bias (models/fold.fold_batchnorm) adds after the conv and is untouched.
    """
    params = variables["params"]
    out = dict(variables)
    node = out["params"] = dict(params)
    for name in stem[:-1]:
        node[name] = dict(node[name])
        node = node[name]
    leaf = dict(node[stem[-1]])
    leaf["kernel"] = leaf["kernel"] * (1.0 / 255.0)
    node[stem[-1]] = leaf
    return out


def yolo_stem_cin(yolo_variables: dict) -> int:
    """Static input-channel count of the YOLO stem conv (1 after
    :func:`fold_gray_stem`, 3 otherwise) — lets jitted chunk functions pick
    the matching input layout at trace time."""
    return int(
        yolo_variables["params"]["ConvBNSiLU_0"]["Conv_0"]["kernel"].shape[2])


def is_folded(variables: dict) -> bool:
    """Structural signature of a folded tree: no batch_stats and no
    BatchNorm params anywhere, while the (bias-free when unfolded)
    DoubleConv/ConvBNSiLU convs carry a bias."""
    if "batch_stats" in variables and variables["batch_stats"]:
        return False
    leaves = []

    def names(p, path=""):
        for k, v in p.items():
            if isinstance(v, dict):
                names(v, path + "/" + k)
            else:
                leaves.append(path + "/" + k)

    names(variables.get("params", {}))
    if any("BatchNorm" in n for n in leaves):
        return False
    return any(n.endswith("/bias") and "/Conv_" in n
               and ("DoubleConv" in n or "ConvBNSiLU" in n) for n in leaves)
