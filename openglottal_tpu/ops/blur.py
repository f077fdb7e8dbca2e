"""Separable Gaussian blur with cv2.GaussianBlur semantics.

The reference blurs motion maps with ``cv2.GaussianBlur(x, (13, 13), 0)``
(openglottal/models/tracker.py:87,102,198,220) and augments with ksize 3/5 and
explicit sigma (openglottal/models/unet.py:182-184).  cv2 semantics replicated:

  * sigma <= 0  =>  sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8
  * ksize in {1,3,5,7} with sigma <= 0 uses cv2's fixed small-kernel table
  * border mode BORDER_REFLECT_101 (jnp.pad mode='reflect')

Implementation: reflect-pad then k shifted multiply-adds per axis — pure VPU
work, fuses into surrounding elementwise ops under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_SMALL_TAB = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}


def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel, float64 -> float32."""
    if sigma <= 0 and ksize in _SMALL_TAB:
        return _SMALL_TAB[ksize].astype(np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    c = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64)
    k = np.exp(-((x - c) ** 2) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnums=(1,), static_argnames=("sigma",))
def gaussian_blur(img, ksize: int, sigma: float = 0.0):
    """Blur (..., H, W) float array along the trailing two axes."""
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    r = ksize // 2
    x = img.astype(jnp.float32)
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)]
    x = jnp.pad(x, pad, mode="reflect")
    rows = sum(k[d] * jax.lax.dynamic_slice_in_dim(x, d, h, axis=-2) for d in range(ksize))
    out = sum(k[d] * jax.lax.dynamic_slice_in_dim(rows, d, w, axis=-1) for d in range(ksize))
    return out
