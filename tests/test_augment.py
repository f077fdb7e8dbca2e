"""Augmentation statistics (reference unet.py:150-191 parameters; parity is
statistical — the reference RNG is unseeded, SURVEY §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from openglottal_tpu.data.augment import augment_batch


def _batch(b=64):
    rng = np.random.default_rng(0)
    imgs = rng.random((b, 256, 256)).astype(np.float32)
    msks = np.zeros((b, 256, 256), np.float32)
    msks[:, 100:160, 110:150] = 1.0
    return jnp.asarray(imgs), jnp.asarray(msks)


def test_outputs_in_range_and_masks_binary():
    imgs, msks = _batch()
    ai, am = augment_batch(jax.random.PRNGKey(0), imgs, msks)
    ai, am = np.asarray(ai), np.asarray(am)
    assert ai.min() >= 0 and ai.max() <= 1
    assert set(np.unique(am)) <= {0.0, 1.0}


def test_geometry_applied_jointly():
    """The mask must undergo the same geometric transform as the image:
    a bright patch placed exactly on the mask stays on the mask."""
    b = 32
    imgs = jnp.zeros((b, 256, 256))
    msks = jnp.zeros((b, 256, 256)).at[:, 100:160, 110:150].set(1.0)
    imgs = imgs.at[:, 100:160, 110:150].set(1.0)
    ai, am = augment_batch(jax.random.PRNGKey(1), imgs, msks)
    ai, am = np.asarray(ai), np.asarray(am)
    for i in range(b):
        sel = am[i] > 0.5
        if sel.sum() < 50:
            continue
        # photometric ops change intensity but the patch must dominate inside
        # the transformed mask vs outside
        assert ai[i][sel].mean() > ai[i][~sel].mean() + 0.2, i


def test_photometric_factor_distributions():
    """Brightness/contrast: applied at p≈0.5 with factors ~U[0.7, 1.3] —
    BOTH sides of 1.0 (round-1 bug: a reused RNG key conditioned the factor
    on the apply flag, so factors only ever landed in (1.0, 1.3])."""
    from openglottal_tpu.data.augment import _sample_params

    n = 4096
    p = _sample_params(jax.random.PRNGKey(7), n)
    for name in ("bright", "contrast"):
        f = np.asarray(p[name])
        applied = f[f != 1.0]
        rate = len(applied) / n
        assert 0.45 < rate < 0.55, (name, rate)
        assert applied.min() >= 0.7 and applied.max() <= 1.3, name
        # uniform on [0.7, 1.3]: mean ~1.0, both halves populated ~equally
        assert abs(applied.mean() - 1.0) < 0.02, (name, applied.mean())
        frac_dark = (applied < 1.0).mean()
        assert 0.45 < frac_dark < 0.55, (name, frac_dark)
        # ~uniform density: each of 6 bins holds 1/6 ± 1/3 of its share
        hist, _ = np.histogram(applied, bins=6, range=(0.7, 1.3))
        assert (hist > len(applied) / 6 * 0.66).all(), (name, hist)
    # flags/factors of different knobs are pairwise independent draws
    assert abs(np.corrcoef(np.asarray(p["bright"]),
                           np.asarray(p["contrast"]))[0, 1]) < 0.1
    # the noise field key differs from the sigma draw (round-1 reuse)
    sig = np.asarray(p["sigma_n"])
    noise0 = np.asarray(jax.random.normal(p["noise_key"], (n,)))
    assert abs(np.corrcoef(sig, noise0)[0, 1]) < 0.1


def test_flip_rates_and_mask_area_preserved():
    imgs, msks = _batch(128)
    area0 = float(msks.sum())
    ai, am = augment_batch(jax.random.PRNGKey(2), imgs, msks)
    # rotation/flip/scale move the mask; scale in [0.85, 1.15] bounds the area
    area1 = float(np.asarray(am).sum())
    assert 0.6 * area0 < area1 < 1.5 * area0
    # randomness: different keys give different outputs
    ai2, _ = augment_batch(jax.random.PRNGKey(3), imgs, msks)
    assert not np.allclose(np.asarray(ai), np.asarray(ai2))
