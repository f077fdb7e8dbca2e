"""YOLO loss components vs oracles: CIoU vs torchvision, assignment sanity,
decode round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openglottal_tpu.models.yolo import (
    REG_MAX, anchors_for, decode_boxes, init_yolo, max_conf_detect,
)
from openglottal_tpu.train.yolo_loss import pairwise_ciou, yolo_loss

RNG = np.random.default_rng(11)


def _rand_boxes(n):
    x1 = RNG.uniform(0, 200, n)
    y1 = RNG.uniform(0, 200, n)
    w = RNG.uniform(5, 50, n)
    h = RNG.uniform(5, 50, n)
    return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)


def test_ciou_matches_torchvision():
    tv = pytest.importorskip("torchvision.ops")
    import torch

    a = _rand_boxes(6)
    b = _rand_boxes(7)
    want = tv.complete_box_iou(torch.tensor(a), torch.tensor(b)).numpy()
    got, iou = pairwise_ciou(jnp.asarray(a)[:, None, :], jnp.asarray(b)[None, :, :])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_ciou_identity():
    a = _rand_boxes(5)
    ciou, iou = pairwise_ciou(jnp.asarray(a)[:, None, :], jnp.asarray(a)[None, :, :])
    np.testing.assert_allclose(np.asarray(ciou).diagonal(), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou).diagonal(), 1.0, atol=1e-5)


def test_anchor_coverage():
    pts, strides = anchors_for(256, 256)
    assert pts.shape[0] == 32 * 32 + 16 * 16 + 8 * 8
    assert float(strides.min()) == 8 and float(strides.max()) == 32


def test_loss_prefers_better_predictions():
    """Loss evaluated at init must decrease after a few gradient steps
    (sanity: gradients point the right way for box+cls+dfl jointly)."""
    import optax

    model, variables = init_yolo(jax.random.PRNGKey(0), size=64)
    gt = jnp.asarray([[[10.0, 14.0, 40.0, 52.0]]])
    gv = jnp.asarray([[True]])
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            outs = model.apply({"params": p,
                                "batch_stats": variables["batch_stats"]},
                               x, train=False)
            total, parts = yolo_loss(outs, gt, gv, 64, 64)
            return total

        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    losses = []
    for _ in range(8):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.9, losses


def test_decode_boxes_shapes():
    model, variables = init_yolo(jax.random.PRNGKey(0), size=64)
    outs = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    boxes, conf = decode_boxes(outs, 64, 64)
    a = 8 * 8 + 4 * 4 + 2 * 2
    assert boxes.shape == (2, a, 4)
    assert conf.shape == (2, a, 1)
    has, box, c = max_conf_detect(outs, 64, 64, conf_thresh=2.0)
    assert not bool(has.any())  # conf can never exceed 1
