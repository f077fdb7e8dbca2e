"""Batched on-device training augmentation.

Reference augmentation (openglottal/models/unet.py:150-191, applied per
sample on the host CPU): h/v flip, ±30° rotation, 0.85–1.15 scale jitter
(crop/pad back), Gaussian noise σ∈[0.01,0.05], Gaussian blur k∈{3,5}
σ∈[0.5,1.5], brightness ×[0.7,1.3], contrast [0.7,1.3] — each at p=0.5
(rotation always).

TPU re-design: the geometric ops compose into ONE inverse-affine bilinear
(image) / nearest (mask) resample per sample, and everything runs as a single
jitted batch transform with ``jax.random`` keys — no host-side data workers
(the reference trains with num_workers=0 anyway, train_unet.py:143).
Augmentation parity is statistical, not bit-exact: the reference's RNG is
unseeded (SURVEY.md §4.4).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

SIZE = 256


def _sample_params(key, b):
    # one INDEPENDENT key per random decision — the apply-at-p=0.5 flags and
    # the factor draws must not share keys, or the factor distribution is
    # conditioned on the flag (a reused key made brightness/contrast factors
    # land only in (1.0, 1.3]: round-1 bug, fixed + pinned by
    # tests/test_augment.py::test_photometric_factor_distributions)
    ks = jax.random.split(key, 15)
    p = {
        "hflip": jax.random.uniform(ks[0], (b,)) > 0.5,
        "vflip": jax.random.uniform(ks[1], (b,)) > 0.5,
        "angle": jax.random.uniform(ks[2], (b,), minval=-30.0, maxval=30.0),
        "do_scale": jax.random.uniform(ks[3], (b,)) > 0.5,
        "scale": jax.random.uniform(ks[4], (b,), minval=0.85, maxval=1.15),
        "do_noise": jax.random.uniform(ks[5], (b,)) > 0.5,
        "sigma_n": jax.random.uniform(ks[6], (b,), minval=0.01, maxval=0.05),
        "do_blur": jax.random.uniform(ks[7], (b,)) > 0.5,
        "k5": jax.random.uniform(ks[8], (b,)) > 0.5,
        "sigma_b": jax.random.uniform(ks[9], (b,), minval=0.5, maxval=1.5),
        "bright": jnp.where(jax.random.uniform(ks[10], (b,)) > 0.5,
                            jax.random.uniform(ks[11], (b,), minval=0.7, maxval=1.3),
                            1.0),
        "contrast": jnp.where(jax.random.uniform(ks[12], (b,)) > 0.5,
                              jax.random.uniform(ks[13], (b,), minval=0.7, maxval=1.3),
                              1.0),
        "noise_key": ks[14],
    }
    return p


def _affine_coords(hflip, vflip, angle_deg, scale):
    """Per-sample source coordinates for the composed flip∘rotate∘scale.

    torchvision applies flip, then rotate (CCW, about the centre, zero fill),
    then resize+centre-crop/pad — equivalent to an affine scale about the
    centre.  Inverse-mapping: src = c + R(-θ)·(dst - c)/s, then flip."""
    c = (SIZE - 1) / 2.0
    yy, xx = jnp.mgrid[0:SIZE, 0:SIZE]
    x = (xx - c) / scale
    y = (yy - c) / scale
    th = jnp.deg2rad(angle_deg)
    ct, st = jnp.cos(th), jnp.sin(th)
    sx = ct * x - st * y + c
    sy = st * x + ct * y + c
    sx = jnp.where(hflip, (SIZE - 1) - sx, sx)
    sy = jnp.where(vflip, (SIZE - 1) - sy, sy)
    return sy, sx


def _gather_bilinear(img, sy, sx):
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0

    def at(yi, xi):
        inb = (yi >= 0) & (yi < SIZE) & (xi >= 0) & (xi < SIZE)
        v = img[jnp.clip(yi, 0, SIZE - 1).astype(jnp.int32),
                jnp.clip(xi, 0, SIZE - 1).astype(jnp.int32)]
        return jnp.where(inb, v, 0.0)

    return ((1 - wy) * (1 - wx) * at(y0, x0) + (1 - wy) * wx * at(y0, x0 + 1)
            + wy * (1 - wx) * at(y0 + 1, x0) + wy * wx * at(y0 + 1, x0 + 1))


def _gather_nearest(img, sy, sx):
    yi = jnp.round(sy)
    xi = jnp.round(sx)
    inb = (yi >= 0) & (yi < SIZE) & (xi >= 0) & (xi < SIZE)
    v = img[jnp.clip(yi, 0, SIZE - 1).astype(jnp.int32),
            jnp.clip(xi, 0, SIZE - 1).astype(jnp.int32)]
    return jnp.where(inb, v, 0.0)


def _blur5(img, k5, sigma):
    """Gaussian blur with runtime ksize in {3,5}: a 3-tap kernel is a 5-tap
    kernel with zero outer weights, so one 5-tap separable conv covers both."""
    x = jnp.arange(5, dtype=jnp.float32) - 2.0
    k = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    k = jnp.where(k5, k, jnp.where(jnp.abs(x) <= 1, k, 0.0))
    k = k / k.sum()
    pad = jnp.pad(img, ((2, 2), (2, 2)), mode="reflect")
    rows = sum(k[d] * jax.lax.dynamic_slice_in_dim(pad, d, SIZE, 0) for d in range(5))
    return sum(k[d] * jax.lax.dynamic_slice_in_dim(rows, d, SIZE, 1) for d in range(5))


@jax.jit
def augment_batch(key, imgs, msks):
    """imgs: (B, 256, 256) float in [0,1]; msks: (B, 256, 256) float {0,1}."""
    b = imgs.shape[0]
    p = _sample_params(key, b)
    scale = jnp.where(p["do_scale"], p["scale"], 1.0)

    def geo(img, msk, hf, vf, ang, sc):
        sy, sx = _affine_coords(hf, vf, ang, sc)
        return _gather_bilinear(img, sy, sx), _gather_nearest(msk, sy, sx)

    imgs, msks = jax.vmap(geo)(imgs, msks, p["hflip"], p["vflip"],
                               p["angle"], scale)

    noise = jax.random.normal(p["noise_key"], imgs.shape)
    imgs = jnp.where(p["do_noise"][:, None, None],
                     jnp.clip(imgs + noise * p["sigma_n"][:, None, None], 0, 1),
                     imgs)

    blurred = jax.vmap(_blur5)(imgs, p["k5"], p["sigma_b"])
    imgs = jnp.where(p["do_blur"][:, None, None], blurred, imgs)

    imgs = jnp.clip(imgs * p["bright"][:, None, None], 0, 1)

    # torchvision adjust_contrast: blend with the per-image mean of the
    # grayscale, clamped (unet.py:190)
    mean = imgs.mean(axis=(1, 2), keepdims=True)
    c = p["contrast"][:, None, None]
    imgs = jnp.clip(c * imgs + (1 - c) * mean, 0, 1)
    return imgs, msks
