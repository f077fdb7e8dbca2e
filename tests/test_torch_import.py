"""torch <-> flax U-Net weight conversion, verified numerically against an
actual torch model built to the reference architecture
(openglottal/models/unet.py:18-88)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from openglottal_tpu.models.unet import UNet  # noqa: E402
from openglottal_tpu.utils.torch_import import (  # noqa: E402
    unet_from_torch,
    unet_to_torch_state_dict,
)


class _TorchDoubleConv(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv2d(i, o, 3, padding=1, bias=False), nn.BatchNorm2d(o),
            nn.ReLU(inplace=True),
            nn.Conv2d(o, o, 3, padding=1, bias=False), nn.BatchNorm2d(o),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.net(x)


class _TorchUNet(nn.Module):
    """Oracle model: the reference architecture rebuilt for the test."""

    def __init__(self, features=(32, 64, 128, 256)):
        super().__init__()
        self.downs = nn.ModuleList()
        self.ups = nn.ModuleList()
        self.pool = nn.MaxPool2d(2, 2)
        ch = 1
        for f in features:
            self.downs.append(_TorchDoubleConv(ch, f))
            ch = f
        self.bottleneck = _TorchDoubleConv(ch, ch * 2)
        for f in reversed(features):
            self.ups.append(nn.ConvTranspose2d(f * 2, f, 2, 2))
            self.ups.append(_TorchDoubleConv(f * 2, f))
        self.head = nn.Conv2d(features[0], 1, 1)

    def forward(self, x):
        skips = []
        for d in self.downs:
            x = d(x)
            skips.append(x)
            x = self.pool(x)
        x = self.bottleneck(x)
        for i in range(0, len(self.ups), 2):
            x = self.ups[i](x)
            s = skips[-(i // 2 + 1)]
            if x.shape[-2:] != s.shape[-2:]:
                x = F.interpolate(x, s.shape[-2:], mode="bilinear",
                                  align_corners=False)
            x = torch.cat([s, x], dim=1)
            x = self.ups[i + 1](x)
        return self.head(x)


def test_torch_import_matches_outputs():
    torch.manual_seed(0)
    tm = _TorchUNet().eval()
    # randomise batchnorm stats so eval-mode normalisation is nontrivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    x = torch.rand(2, 1, 64, 64)
    with torch.no_grad():
        want = tm(x).numpy()

    variables = unet_from_torch({k: v.numpy() for k, v in tm.state_dict().items()
                                 if "num_batches" not in k})
    variables = jax.tree.map(jnp.asarray, variables)
    model = UNet(dtype=jnp.float32)
    got = model.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                      train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_roundtrip_export():
    torch.manual_seed(1)
    tm = _TorchUNet().eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items() if "num_batches" not in k}
    variables = unet_from_torch(sd)
    back = unet_to_torch_state_dict(variables)
    for k, v in sd.items():
        np.testing.assert_allclose(back[k], v, atol=1e-6, err_msg=k)
