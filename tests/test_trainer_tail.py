"""Partial-batch training semantics (torch DataLoader drop_last=False):
datasets smaller than (or not divisible by) the batch size must still train
— round-2 regression: a 15-image set with batch 16 ran ZERO steps and logged
loss/train = NaN."""

import jax.numpy as jnp
import numpy as np

from openglottal_tpu.train.unet_trainer import UNetTrainer


def _data(n):
    rng = np.random.default_rng(0)
    imgs = (rng.random((n, 256, 256)) * 255).astype(np.uint8)
    msks = (rng.random((n, 256, 256)) > 0.8).astype(np.uint8)
    return imgs, msks


def test_unet_trains_on_sub_batch_dataset():
    imgs, msks = _data(3)
    tr = UNetTrainer(features=(4, 8), batch_size=16, dtype=jnp.float32)
    state, best, hist = tr.fit(imgs, msks, imgs[:2], msks[:2], epochs=1,
                               verbose=False)
    assert np.isfinite(hist[0]["loss/train"])
    assert int(state.step) == 1


def test_unet_tail_batch_trains():
    imgs, msks = _data(5)
    tr = UNetTrainer(features=(4, 8), batch_size=4, dtype=jnp.float32)
    state, best, hist = tr.fit(imgs, msks, imgs[:2], msks[:2], epochs=1,
                               verbose=False)
    assert int(state.step) == 2  # one full batch of 4 + the tail of 1
    assert np.isfinite(hist[0]["loss/train"])


def test_yolo_trains_on_sub_batch_dataset():
    from openglottal_tpu.train.yolo_trainer import YoloTrainer

    rng = np.random.default_rng(1)
    imgs = (rng.random((3, 256, 256, 3)) * 255).astype(np.uint8)
    boxes = np.array([[40, 40, 90, 90], [10, 10, 60, 50], [-1, -1, -1, -1]],
                     np.float32)
    tr = YoloTrainer(batch_size=16, dtype=jnp.float32)
    state, hist = tr.fit(imgs, boxes, epochs=1, verbose=False)
    assert hist[0]["loss/train"] is not None
    assert np.isfinite(hist[0]["loss/train"])


def test_unet_no_val_still_checkpoints_best(tmp_path):
    """Empty val set: improvement tracking falls back to the train loss so
    best/latest checkpoints and patience still function."""
    imgs, msks = _data(4)
    tr = UNetTrainer(features=(4, 8), batch_size=4, dtype=jnp.float32)
    state, best, hist = tr.fit(imgs, msks, imgs[:0], msks[:0], epochs=1,
                               ckpt_dir=tmp_path, verbose=False)
    assert best is not None
    assert (tmp_path / "best").exists()
