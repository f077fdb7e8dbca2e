"""Partial-batch training semantics (torch DataLoader drop_last=False):
datasets smaller than (or not divisible by) the batch size must still train
— round-2 regression: a 15-image set with batch 16 ran ZERO steps and logged
loss/train = NaN."""

import jax
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
    state, best, hist = tr.fit(imgs, boxes, epochs=1, verbose=False)
    assert hist[0]["loss/train"] is not None
    assert np.isfinite(hist[0]["loss/train"])
    assert best is not None  # no-val fallback: best tracks the train loss


def test_yolo_best_checkpoint_tracks_peak_recall(tmp_path, monkeypatch):
    """When recall/val degrades after a peak, ``best`` must retain the
    peak-epoch weights, and patience must stop the run (VERDICT r3 item 5:
    mirror reference train_unet.py:204-213 / ultralytics best.pt)."""
    from openglottal_tpu.train.yolo_trainer import YoloTrainer

    rng = np.random.default_rng(0)
    imgs = (rng.random((4, 256, 256, 3)) * 255).astype(np.uint8)
    boxes = np.array([[40, 40, 90, 90]] * 4, np.float32)

    recalls = iter([0.2, 0.9, 0.4, 0.3, 0.3])
    snaps = []

    def fake_recall(state, *_a, **_k):
        snaps.append(jax.device_get(state.params))
        return next(recalls)

    tr = YoloTrainer(batch_size=4, dtype=jnp.float32)
    monkeypatch.setattr(tr, "eval_recall", fake_recall)
    state, best, hist = tr.fit(imgs, boxes, imgs, boxes, epochs=5,
                               patience=2, verbose=False, mosaic=False,
                               ckpt_dir=tmp_path)
    # early stop: peak at epoch 2, patience 2 -> stops after epoch 4
    assert len(hist) == 4
    assert [h["recall/val"] for h in hist] == [0.2, 0.9, 0.4, 0.3]
    # best == the epoch-2 snapshot, not the final state
    peak = snaps[1]
    same = jax.tree.map(lambda a, b: np.array_equal(a, b), best["params"], peak)
    assert all(jax.tree.leaves(same))
    final = jax.device_get(state.params)
    diff = jax.tree.map(lambda a, b: np.array_equal(a, b), best["params"], final)
    assert not all(jax.tree.leaves(diff))
    assert (tmp_path / "best").exists() and (tmp_path / "latest").exists()


def test_unet_no_val_still_checkpoints_best(tmp_path):
    """Empty val set: improvement tracking falls back to the train loss so
    best/latest checkpoints and patience still function."""
    imgs, msks = _data(4)
    tr = UNetTrainer(features=(4, 8), batch_size=4, dtype=jnp.float32)
    state, best, hist = tr.fit(imgs, msks, imgs[:0], msks[:0], epochs=1,
                               ckpt_dir=tmp_path, verbose=False)
    assert best is not None
    assert (tmp_path / "best").exists()
