"""dice/iou conventions (utils.py:191-213)."""

import jax
import jax.numpy as jnp
import numpy as np

from openglottal_tpu.ops import dice, iou, dice_loss


def test_empty_empty_is_one():
    z = jnp.zeros((16, 16))
    assert float(dice(z, z)) == 1.0
    assert float(iou(z, z)) == 1.0


def test_disjoint_is_zero():
    a = jnp.zeros((8, 8)).at[0, 0].set(1)
    b = jnp.zeros((8, 8)).at[7, 7].set(1)
    assert float(dice(a, b)) == 0.0
    assert float(iou(a, b)) == 0.0


def test_against_numpy():
    rng = np.random.default_rng(0)
    p = rng.random((32, 32)) > 0.5
    g = rng.random((32, 32)) > 0.5
    inter = (p & g).sum()
    want_d = 2 * inter / (p.sum() + g.sum())
    want_i = inter / (p.sum() + g.sum() - inter)
    assert abs(float(dice(p, g)) - want_d) < 1e-6
    assert abs(float(iou(p, g)) - want_i) < 1e-6


def test_batched():
    rng = np.random.default_rng(1)
    p = rng.random((4, 16, 16)) > 0.5
    g = rng.random((4, 16, 16)) > 0.5
    d = dice(p, g)
    assert d.shape == (4,)


def test_dice_loss_grad():
    logits = jnp.zeros((2, 8, 8, 1))
    target = jnp.ones((2, 8, 8, 1))
    loss, grad = jax.value_and_grad(dice_loss)(logits, target)
    assert 0 <= float(loss) <= 1
    assert not np.allclose(np.asarray(grad), 0)
