"""Ultralytics-free YOLO .pt import (utils/yolo_import.py).

Strategy: build a REAL torch model with ultralytics' exact module layout and
attribute names (Conv.conv/.bn, C2f.cv1/.cv2/.m, SPPF, Detect.cv2/.cv3/.dfl,
DetectionModel.model Sequential with the v8n layer indices), torch.save it
the way ultralytics does ({"model": <module object>}), then:

  1. the stub unpickler must recover the full state_dict from the .pt
     without the defining classes being importable as ultralytics,
  2. the remapped Flax variables must reproduce the torch model's forward
     outputs numerically (the complete v8n graph: backbone, FPN, head),
  3. export -> import round-trips exactly.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from openglottal_tpu.models.yolo import YOLOv8
from openglottal_tpu.utils.yolo_import import (
    yolo_from_torch,
    yolo_state_dict_from_pt,
    yolo_to_torch_state_dict,
)


class Conv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(tnn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = Conv(c1, c2, 3)
        self.cv2 = Conv(c2, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, c2, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(
            Bottleneck(self.c, self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(tnn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat([x, y1, y2, self.m(y2)], 1))


class DFL(tnn.Module):
    def __init__(self, c1=16):
        super().__init__()
        self.conv = tnn.Conv2d(c1, 1, 1, bias=False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float32).view(
            1, c1, 1, 1)
        self.conv.requires_grad_(False)


class Detect(tnn.Module):
    def __init__(self, nc=1, ch=(64, 128, 256), reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(Conv(c, c2, 3), Conv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for c in ch)
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(Conv(c, c3, 3), Conv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1)) for c in ch)
        self.dfl = DFL(reg_max)

    def forward(self, feats):
        return [(b(x), c(x)) for x, b, c in zip(feats, self.cv2, self.cv3)]


class DetectionModel(tnn.Module):
    """v8n layer indices as in ultralytics yolov8.yaml (paramless layers
    placed to keep the numbering)."""

    def __init__(self, nc=1):
        super().__init__()
        up = tnn.Upsample(scale_factor=2, mode="nearest")
        self.model = tnn.Sequential(
            Conv(3, 16, 3, 2),            # 0
            Conv(16, 32, 3, 2),           # 1
            C2f(32, 32, 1, True),         # 2
            Conv(32, 64, 3, 2),           # 3
            C2f(64, 64, 2, True),         # 4
            Conv(64, 128, 3, 2),          # 5
            C2f(128, 128, 2, True),       # 6
            Conv(128, 256, 3, 2),         # 7
            C2f(256, 256, 1, True),       # 8
            SPPF(256, 256),               # 9
            up,                           # 10
            tnn.Identity(),               # 11 (Concat)
            C2f(384, 128, 1),             # 12
            up,                           # 13
            tnn.Identity(),               # 14
            C2f(192, 64, 1),              # 15
            Conv(64, 64, 3, 2),           # 16
            tnn.Identity(),               # 17
            C2f(192, 128, 1),             # 18
            Conv(128, 128, 3, 2),         # 19
            tnn.Identity(),               # 20
            C2f(384, 256, 1),             # 21
            Detect(nc),                   # 22
        )

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x4 = m[4](m[3](m[2](x)))
        x6 = m[6](m[5](x4))
        x9 = m[9](m[8](m[7](x6)))
        x12 = m[12](torch.cat([m[10](x9), x6], 1))
        p3 = m[15](torch.cat([m[13](x12), x4], 1))
        p4 = m[18](torch.cat([m[16](p3), x12], 1))
        p5 = m[21](torch.cat([m[19](p4), x9], 1))
        return m[22]([p3, p4, p5])


def _randomize(model):
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "dfl" in name:
                continue
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.01)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)
    return model


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    model = _randomize(DetectionModel()).eval().half()
    path = tmp_path_factory.mktemp("pt") / "fake_ultralytics_v8n.pt"
    torch.save({"model": model, "epoch": 1, "train_args": {"imgsz": 256}},
               path)
    return path, model.float()


def test_state_dict_extraction_matches_manifest(torch_ckpt):
    path, model = torch_ckpt
    sd = yolo_state_dict_from_pt(path)
    want = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    got = {k: tuple(v.shape) for k, v in sd.items()}
    assert got == want
    np.testing.assert_allclose(
        sd["model.0.conv.weight"],
        model.state_dict()["model.0.conv.weight"].numpy(), atol=1e-3)


def test_forward_parity_with_torch(torch_ckpt):
    path, model = torch_ckpt
    variables = yolo_from_torch(path)

    x = np.random.default_rng(1).random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_outs = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_outs = YOLOv8(nc=1).apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    assert len(f_outs) == len(t_outs) == 3
    for (fb, fc), (tb, tc) in zip(f_outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(fb), np.transpose(tb.numpy(), (0, 2, 3, 1)),
            atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(fc), np.transpose(tc.numpy(), (0, 2, 3, 1)),
            atol=2e-3)


def test_export_import_round_trip(torch_ckpt):
    path, _ = torch_ckpt
    variables = yolo_from_torch(path)
    sd = yolo_to_torch_state_dict(variables)
    again = yolo_from_torch(sd)
    flat1 = jax.tree_util.tree_leaves(variables)
    flat2 = jax.tree_util.tree_leaves(again)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_yolo_weights_accepts_pt(torch_ckpt, monkeypatch):
    from openglottal_tpu.utils.io import load_yolo_weights

    path, _ = torch_ckpt
    v = load_yolo_weights(path)
    assert "params" in v and "batch_stats" in v
