"""torch -> flax weight conversion for the reference U-Net.

The reference distributes U-Net weights as torch ``state_dict`` .pt files
(train_unet.py:204-208; the mirror's weight blobs are stripped, but users of
the reference will have their own).  Layout mapping (reference
openglottal/models/unet.py:36-88 -> our flax UNet):

  downs.{i}.net.{0,3}   -> DoubleConv_{i}.Conv_{0,1}        (OIHW -> HWIO)
  downs.{i}.net.{1,4}   -> DoubleConv_{i}.BatchNorm_{0,1}
  bottleneck.net.*      -> DoubleConv_4.*
  ups.{2k}              -> ConvTranspose_{k}                (IOHW -> HWIO)
  ups.{2k+1}.net.*      -> DoubleConv_{5+k}.*
  head                  -> Conv_0

flax ConvTranspose (lax.conv_transpose, transpose_kernel=False) computes the
same scatter as torch's ConvTranspose2d once the kernel is mirrored spatially
— for the reference's k=2/s=2 case verified numerically in
tests/test_torch_import.py.
"""

from __future__ import annotations

import numpy as np


def _conv_kernel(w) -> np.ndarray:
    # torch Conv2d (O, I, kH, kW) -> flax (kH, kW, I, O)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convT_kernel(w) -> np.ndarray:
    # torch ConvTranspose2d (I, O, kH, kW) -> flax (kH, kW, I, O), mirrored
    # spatially to equate lax.conv_transpose's correlation with torch's scatter
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1))


def _double_conv(sd: dict, prefix: str):
    params = {}
    stats = {}
    for j, (conv_idx, bn_idx) in enumerate([(0, 1), (3, 4)]):
        params[f"Conv_{j}"] = {"kernel": _conv_kernel(sd[f"{prefix}.net.{conv_idx}.weight"])}
        params[f"BatchNorm_{j}"] = {
            "scale": np.asarray(sd[f"{prefix}.net.{bn_idx}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.net.{bn_idx}.bias"]),
        }
        stats[f"BatchNorm_{j}"] = {
            "mean": np.asarray(sd[f"{prefix}.net.{bn_idx}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.net.{bn_idx}.running_var"]),
        }
    return params, stats


def unet_from_torch(pt_path_or_state_dict, n_levels: int = 4):
    """Convert a reference U-Net torch checkpoint to flax variables."""
    if isinstance(pt_path_or_state_dict, (str, bytes)) or hasattr(
        pt_path_or_state_dict, "__fspath__"
    ):
        import torch

        sd = torch.load(pt_path_or_state_dict, map_location="cpu",
                        weights_only=True)
        # tolerant loader: accept {model|state_dict|raw} (train_unet.py:149)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        elif isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "items"):
            sd = sd["model"]
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in pt_path_or_state_dict.items()}

    params: dict = {}
    stats: dict = {}
    for i in range(n_levels):
        params[f"DoubleConv_{i}"], stats[f"DoubleConv_{i}"] = _double_conv(
            sd, f"downs.{i}")
    params[f"DoubleConv_{n_levels}"], stats[f"DoubleConv_{n_levels}"] = \
        _double_conv(sd, "bottleneck")
    for k in range(n_levels):
        params[f"ConvTranspose_{k}"] = {
            "kernel": _convT_kernel(sd[f"ups.{2 * k}.weight"]),
            "bias": np.asarray(sd[f"ups.{2 * k}.bias"]),
        }
        dc, st = _double_conv(sd, f"ups.{2 * k + 1}")
        params[f"DoubleConv_{n_levels + 1 + k}"] = dc
        stats[f"DoubleConv_{n_levels + 1 + k}"] = st
    params["Conv_0"] = {
        "kernel": _conv_kernel(sd["head.weight"]),
        "bias": np.asarray(sd["head.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def unet_to_torch_state_dict(variables) -> dict:
    """Inverse conversion (export our weights for reference-toolchain users)."""
    import jax

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    sd = {}

    def put_dc(prefix, p, s):
        for j, (ci, bi) in enumerate([(0, 1), (3, 4)]):
            sd[f"{prefix}.net.{ci}.weight"] = np.transpose(
                p[f"Conv_{j}"]["kernel"], (3, 2, 0, 1))
            sd[f"{prefix}.net.{bi}.weight"] = p[f"BatchNorm_{j}"]["scale"]
            sd[f"{prefix}.net.{bi}.bias"] = p[f"BatchNorm_{j}"]["bias"]
            sd[f"{prefix}.net.{bi}.running_mean"] = s[f"BatchNorm_{j}"]["mean"]
            sd[f"{prefix}.net.{bi}.running_var"] = s[f"BatchNorm_{j}"]["var"]
            sd[f"{prefix}.net.{bi}.num_batches_tracked"] = np.asarray(0)

    for i in range(4):
        put_dc(f"downs.{i}", params[f"DoubleConv_{i}"], stats[f"DoubleConv_{i}"])
    put_dc("bottleneck", params["DoubleConv_4"], stats["DoubleConv_4"])
    for k in range(4):
        kern = params[f"ConvTranspose_{k}"]["kernel"][::-1, ::-1]
        sd[f"ups.{2 * k}.weight"] = np.transpose(kern, (2, 3, 0, 1))
        sd[f"ups.{2 * k}.bias"] = params[f"ConvTranspose_{k}"]["bias"]
        put_dc(f"ups.{2 * k + 1}", params[f"DoubleConv_{5 + k}"],
               stats[f"DoubleConv_{5 + k}"])
    sd["head.weight"] = np.transpose(params["Conv_0"]["kernel"], (3, 2, 0, 1))
    sd["head.bias"] = params["Conv_0"]["bias"]
    return sd
